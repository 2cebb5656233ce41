/* Large-scene CPU-lucille baseline driver.
 *
 * Renders a procedurally generated heightfield (n x n vertex grid,
 * 2*(n-1)^2 triangles after the polygon driver triangulates the quads)
 * through the reference's Ri* C API, with the bundled
 * ambient_occlusion.rib camera, AO integrator defaults (gather_nsamples
 * = 64, option.c:148) and the BVH accelerator (option.c:116).  The
 * frame-end statistics print total rays and M rays/sec exactly as
 * raytrace.c:96-107 defines them; WALL below wraps RiWorldEnd (BVH
 * build + render).
 *
 * Build (after tests/golden/build_lucille.sh):
 *   gcc -O2 -I/root/reference/include tests/golden/bench_large_driver.c \
 *       /tmp/lucille_cpu/liblucille.a -lm -lpthread -o /tmp/bench_large_cpu
 * Run:
 *   /tmp/bench_large_cpu <n> [width height pixelsamples]
 *
 * The Python twin (bench_large.py) generates the identical scene for
 * lucille_tpu so large-scene numbers compare the SAME workload.
 */
#include <math.h>
#include <stdio.h>
#include <stdlib.h>
#include <sys/time.h>

#include "ri.h"

static double now(void) {
    struct timeval tv;
    gettimeofday(&tv, 0);
    return tv.tv_sec + 1e-6 * tv.tv_usec;
}

/* deterministic analytic terrain; float math so the Python twin matches */
static float hf(float x, float z) {
    return 0.5f * sinf(1.3f * x) * cosf(1.1f * z) +
           0.25f * sinf(2.7f * x + 1.0f) * sinf(1.9f * z);
}

int main(int argc, char **argv) {
    int n = argc > 1 ? atoi(argv[1]) : 256;
    int W = argc > 2 ? atoi(argv[2]) : 160;
    int H = argc > 3 ? atoi(argv[3]) : 120;
    int ps = argc > 4 ? atoi(argv[4]) : 2;
    int nq = (n - 1) * (n - 1);
    int i, j, q;

    RtInt *nv = (RtInt *)malloc(nq * sizeof(RtInt));
    RtInt *vi = (RtInt *)malloc((size_t)nq * 4 * sizeof(RtInt));
    RtFloat *P = (RtFloat *)malloc((size_t)n * n * 3 * sizeof(RtFloat));
    for (j = 0; j < n; j++) {
        for (i = 0; i < n; i++) {
            float x = -5.0f + 10.0f * i / (n - 1);
            float z = -5.0f + 10.0f * j / (n - 1);
            P[3 * (j * n + i) + 0] = x;
            P[3 * (j * n + i) + 1] = hf(x, z);
            P[3 * (j * n + i) + 2] = z;
        }
    }
    q = 0;
    for (j = 0; j < n - 1; j++) {
        for (i = 0; i < n - 1; i++) {
            nv[q] = 4;
            vi[4 * q + 0] = j * n + i;
            vi[4 * q + 1] = j * n + i + 1;
            vi[4 * q + 2] = (j + 1) * n + i + 1;
            vi[4 * q + 3] = (j + 1) * n + i;
            q++;
        }
    }

    RiBegin(RI_NULL);
    RiDisplay("/tmp/bench_large_cpu.hdr", "file", "rgb", RI_NULL);
    RiFormat((RtInt)W, (RtInt)H, 1.0f);
    RiPixelSamples((RtFloat)ps, (RtFloat)ps);
    {
        RtFloat fov = 45.0f;
        RtToken tok[1] = {"fov"};
        RtPointer val[1] = {(RtPointer)&fov};
        RiProjectionV("perspective", 1, tok, val);
    }
    RiOrientation("rh");
    {
        /* the bundled ambient_occlusion.rib camera (slightly tilted,
         * 15.5 units back) — the terrain spans the same [-5,5]^2 the
         * bundled floor does, so it fills the frame the same way */
        RtMatrix m = {
            {0.994530f, 0.008385f, -0.104111f, 0.0f},
            {0.052799f, 0.819679f, 0.570385f, 0.0f},
            {0.090120f, -0.572762f, 0.814753f, 0.0f},
            {-0.000009f, -0.000015f, -15.529361f, 1.0f},
        };
        RiConcatTransform(m);
    }
    RiWorldBegin();
    {
        /* identity object->world transform, like every geometry group in
         * the bundled scenes (without it the camera transform would leak
         * into the object transform) */
        RtMatrix ident = {
            {1.0f, 0.0f, 0.0f, 0.0f},
            {0.0f, 1.0f, 0.0f, 0.0f},
            {0.0f, 0.0f, 1.0f, 0.0f},
            {0.0f, 0.0f, 0.0f, 1.0f},
        };
        RtToken tok[1] = {"P"};
        RtPointer val[1] = {(RtPointer)P};
        RiAttributeBegin();
        RiTransform(ident);
        RiPointsPolygonsV((RtInt)nq, nv, vi, 1, tok, val);
        RiAttributeEnd();
    }
    {
        double t0 = now();
        RiWorldEnd(); /* scene setup + BVH build + render fire here */
        printf("WALL %.6f\n", now() - t0);
    }
    RiEnd();
    return 0;
}
