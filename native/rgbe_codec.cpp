// Native RGBE (.hdr) RLE codec — the hot inner loops of the Radiance
// scanline format.  Counterpart of the reference's native rgbe.c
// (src/imageio/rgbe.c, Bruce Walter's implementation of Greg Ward's
// format): the Python layer (lucille_tpu/imageio/rgbe.py) does the
// vectorized float<->RGBE conversion and header handling; these
// functions do the per-byte run-length coding that is slow in Python
// (~3.5 s for a 1080p frame) and is pure pointer chasing — exactly the
// kind of host-side hot spot SURVEY.md section 7 assigns to native code.
//
// The encoder mirrors rgbe.py's greedy rule byte-for-byte (runs of >= 4
// encode as 128+len, literals break at an upcoming 4-run or 128 bytes),
// so both paths produce identical files.

#include <cstdint>
#include <cstring>

extern "C" {

// Encode (h, w, 4) RGBE bytes into new-style RLE scanlines:
// per scanline a 4-byte header (2, 2, w>>8, w&255) then the 4 components
// RLE-coded separately.  Returns bytes written, or -1 if `cap` is too
// small (caller allocates the worst case: w + w/128 + slack per comp).
long rgbe_encode_scanlines(const uint8_t* rgbe, int w, int h,
                           uint8_t* out, long cap) {
    if (w < 8 || w > 0x7fff) return -1;  // flat format territory
    long o = 0;
    uint8_t* comp = new uint8_t[w];
    for (int y = 0; y < h; ++y) {
        if (o + 4 > cap) { delete[] comp; return -1; }
        out[o++] = 2;
        out[o++] = 2;
        out[o++] = (uint8_t)((w >> 8) & 0xff);
        out[o++] = (uint8_t)(w & 0xff);
        const uint8_t* row = rgbe + (long)y * w * 4;
        for (int c = 0; c < 4; ++c) {
            for (int x = 0; x < w; ++x) comp[x] = row[x * 4 + c];
            int i = 0;
            while (i < w) {
                int run = 1;
                while (i + run < w && run < 127 && comp[i + run] == comp[i])
                    ++run;
                if (run >= 4) {
                    if (o + 2 > cap) { delete[] comp; return -1; }
                    out[o++] = (uint8_t)(128 + run);
                    out[o++] = comp[i];
                    i += run;
                } else {
                    int j = i;
                    while (j < w && j - i < 128) {
                        if (j + 3 < w && comp[j] == comp[j + 1] &&
                            comp[j] == comp[j + 2] && comp[j] == comp[j + 3])
                            break;
                        ++j;
                    }
                    int cnt = j - i;
                    if (cnt == 0) { cnt = 1; j = i + 1; }
                    if (o + 1 + cnt > cap) { delete[] comp; return -1; }
                    out[o++] = (uint8_t)cnt;
                    std::memcpy(out + o, comp + i, (size_t)cnt);
                    o += cnt;
                    i = j;
                }
            }
        }
    }
    delete[] comp;
    return o;
}

// Decode RLE (or flat) scanline data into (h, w, 4) RGBE bytes.
// Returns bytes consumed, or -1 on malformed input / overrun.
long rgbe_decode_scanlines(const uint8_t* data, long n, int w, int h,
                           uint8_t* out) {
    long bi = 0;
    for (int y = 0; y < h; ++y) {
        uint8_t* row = out + (long)y * w * 4;
        bool rle = w >= 8 && w <= 0x7fff && bi + 4 <= n && data[bi] == 2 &&
                   data[bi + 1] == 2;
        if (!rle) {
            if (bi + (long)w * 4 > n) return -1;
            std::memcpy(row, data + bi, (size_t)w * 4);
            bi += (long)w * 4;
            continue;
        }
        int sw = ((int)data[bi + 2] << 8) | (int)data[bi + 3];
        if (sw != w) return -1;
        bi += 4;
        for (int c = 0; c < 4; ++c) {
            int x = 0;
            while (x < w) {
                if (bi >= n) return -1;
                int code = data[bi++];
                if (code > 128) {  // run
                    int cnt = code - 128;
                    if (bi >= n || x + cnt > w) return -1;
                    uint8_t v = data[bi++];
                    for (int k = 0; k < cnt; ++k) row[(x + k) * 4 + c] = v;
                    x += cnt;
                } else {  // literal
                    if (bi + code > n || x + code > w) return -1;
                    for (int k = 0; k < code; ++k)
                        row[(x + k) * 4 + c] = data[bi + k];
                    bi += code;
                    x += code;
                }
            }
        }
    }
    return bi;
}

}  // extern "C"
