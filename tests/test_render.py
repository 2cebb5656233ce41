"""End-to-end render tests: the AO parity gate (SURVEY.md section 7 step 4).

Golden images in tests/golden/ were produced by CPU-lucille itself
(compiled from /root/reference with gcc and driven through its Ri* C API —
see tests/golden/gen_ri_driver.py).  Tolerances reflect Monte-Carlo noise:
both renderers use 64 stratified AO rays with different RNG streams.
"""

import os

import numpy as np
import pytest

GOLDEN = os.path.join(os.path.dirname(__file__), "golden")
RIB = "/root/reference/examples/ambient_occlusion/ambient_occlusion.rib"


def _render_ao(width, height, **overrides):
    from lucille_tpu.render.renderer import Renderer
    from lucille_tpu.ri.api import RiState
    from lucille_tpu.rib.parser import parse_rib_file

    state = RiState()
    parse_rib_file(RIB, state)
    state.Format(width, height)
    for k, v in overrides.items():
        setattr(state.options, k, v)
    r = Renderer(state.scene, tile_size=32)
    img = r.render_frame()
    return img, r


@pytest.mark.skipif(not os.path.exists(RIB), reason="reference unavailable")
class TestAOParity:
    def test_matches_lucille_golden_80x60(self):
        golden = np.asarray(
            __import__(
                "lucille_tpu.imageio.rgbe", fromlist=["read_hdr"]
            ).read_hdr(os.path.join(GOLDEN, "ao_80x60_ref.hdr"))
        )
        img, r = _render_ao(80, 60)
        # flip: lucille's hdr rows are written screenheight-y-1 (render.c:945)
        ours = img[::-1]
        diff = np.abs(golden - ours).mean(axis=-1)
        assert diff.mean() < 0.01, f"mean diff {diff.mean():.4f}"
        assert (diff > 0.1).mean() < 0.005
        # statistics are live
        assert r.stats.nrays > 100_000

    def test_deterministic_given_key(self):
        img1, _ = _render_ao(64, 48)
        img2, _ = _render_ao(64, 48)
        np.testing.assert_array_equal(img1, img2)

    @pytest.mark.slow  # full-frame brute-force cross-check, ~40 s
    def test_bruteforce_accel_matches_bvh(self):
        img_bvh, _ = _render_ao(64, 48, accel_method="bvh")
        img_bf, _ = _render_ao(64, 48, accel_method="bruteforce")
        # "bvh" routes to the fused tile-BVH AO kernel, whose stratified
        # jitter is a Cranley-Patterson rotation (pallas_bvh.py) while the
        # bruteforce scan path draws fresh per-stratum uniforms — both are
        # unbiased stratified estimators, so parity is statistical here.
        # Exact traversal parity (same rays -> same hits/occlusion counts)
        # is asserted in tests/test_pallas_bvh.py.
        diff = np.abs(img_bvh - img_bf)
        assert diff.mean() < 0.01, f"mean diff {diff.mean():.4f}"
        assert diff.max() < 0.12, f"max diff {diff.max():.4f}"


PS_RIB = "/root/reference/examples/plane_sphere/Scene_DEFAULT_Set0.rib"


@pytest.mark.skipif(not os.path.exists(PS_RIB), reason="reference unavailable")
class TestPlaneSphereParity:
    @pytest.mark.slow  # 128x128 golden frame vs CPU-lucille, ~105 s
    def test_matches_lucille_golden_128(self):
        """plane_sphere (ReadArchive chains, MOSAIC surfaces, searchpaths)
        vs the CPU-lucille golden at 128x128 (BASELINE config 2)."""
        from lucille_tpu.imageio.rgbe import read_hdr
        from lucille_tpu.render.renderer import Renderer
        from lucille_tpu.ri.api import RiState
        from lucille_tpu.rib.parser import parse_rib_file

        golden_path = os.path.join(GOLDEN, "plane_sphere_128_ref.hdr")
        if not os.path.exists(golden_path):
            pytest.skip("golden unavailable")
        golden = read_hdr(golden_path)

        s = RiState()
        parse_rib_file(PS_RIB, s)
        assert s.scene.ntriangles == 1986
        s.Format(128, 128)
        # CPU-lucille accepts-and-ignores RiImager; lucille_tpu EXECUTES
        # MOSAICbackground (shading/pipeline.py), which fills escaped
        # pixels with the export's bgcolor.  Pixel parity against the
        # reference's golden is therefore pre-imager.
        s.scene.options.imager = None
        img = Renderer(s.scene, tile_size=64).render_frame()
        diff = np.abs(golden - img[::-1]).mean(axis=-1)
        assert diff.mean() < 0.01, f"mean diff {diff.mean():.4f}"
        assert (diff > 0.1).mean() < 0.005


class TestEmptyScene:
    def test_renders_black(self):
        from lucille_tpu.render.renderer import Renderer
        from lucille_tpu.ri.api import RiState
        from lucille_tpu.rib.parser import parse_rib

        s = RiState()
        parse_rib("Display \"x.hdr\" \"file\" \"rgb\"\nWorldBegin\nWorldEnd\n", s)
        s.Format(32, 32)
        img = Renderer(s.scene, tile_size=32).render_frame()
        assert img.shape == (32, 32, 3)
        np.testing.assert_array_equal(img, 0.0)


class TestDisplayChain:
    def test_file_driver_writes_flipped_hdr(self, tmp_path):
        from lucille_tpu.display.drivers import FileDriver
        from lucille_tpu.imageio.rgbe import read_hdr

        drv = FileDriver()
        drv.open(str(tmp_path / "o.hdr"), 8, 8)
        tile = np.zeros((8, 8, 3), dtype=np.float32)
        tile[0, :, 0] = 1.0  # raster row 0 -> red
        drv.write(0, 0, tile)
        drv.close()
        img = read_hdr(tmp_path / "o.hdr")
        # raster row 0 must land on the LAST file row (lucille layout)
        assert img[-1, :, 0].min() > 0.9
        assert img[0, :, 0].max() < 0.1

    def test_unknown_driver_falls_back_to_file(self):
        from lucille_tpu.display.drivers import FileDriver, get_display_driver

        drv = get_display_driver("no_such_driver")
        assert isinstance(drv, FileDriver)


class TestCheckpointResume:
    """Tile-level checkpoint/resume (SURVEY.md section 5: the reference has
    none — a crash loses the frame; ours resumes from the last tile)."""

    def _state(self):
        from lucille_tpu.rib.parser import parse_rib
        from lucille_tpu.ri.api import RiState

        state = RiState()
        parse_rib(
            """
            Display "c.hdr" "file" "rgb"
            Format 48 32 1
            PixelSamples 2 2
            Projection "perspective" "fov" [45]
            Orientation "rh"
            ConcatTransform [1 0 0 0  0 1 0 0  0 0 1 0  0 -1 -6 1]
            WorldBegin
            PointsPolygons [4] [0 1 2 3] "P" [-5 0 -5  5 0 -5  5 0 5  -5 0 5]
            PointsPolygons [3] [0 1 2] "P" [-1 0 -1  1 0 -1  0 2 0]
            WorldEnd
            """,
            state,
        )
        return state

    def test_resume_reproduces_full_frame(self, tmp_path):
        import numpy as np
        from lucille_tpu.render.renderer import Renderer

        ckpt = str(tmp_path / "frame.ckpt.npz")
        state = self._state()
        full = Renderer(state.scene, tile_size=16).render_frame()

        # interrupted run: crash after 2 tiles (tile_cb raises)
        state2 = self._state()
        r2 = Renderer(state2.scene, tile_size=16)
        count = [0]

        def crash_cb(x0, y0, tile):
            count[0] += 1
            if count[0] >= 2:
                raise KeyboardInterrupt

        try:
            r2.render_frame(tile_cb=crash_cb, checkpoint=ckpt)
            raise AssertionError("crash_cb should have interrupted")
        except KeyboardInterrupt:
            pass
        import os

        assert os.path.exists(ckpt)
        data = np.load(ckpt)
        assert 0 < data["done"].sum() < data["done"].shape[0]

        # recovered run completes and matches the uninterrupted frame
        state3 = self._state()
        r3 = Renderer(state3.scene, tile_size=16)
        replayed = []
        img = r3.render_frame(
            tile_cb=lambda x0, y0, t: replayed.append((x0, y0)),
            checkpoint=ckpt,
            recover=True,
        )
        np.testing.assert_allclose(img, full, atol=1e-6)
        # every tile reached the displays (recovered ones replayed)
        assert len(replayed) == data["done"].shape[0]
        assert not os.path.exists(ckpt)  # removed on completion

    def test_mismatched_checkpoint_ignored(self, tmp_path):
        import numpy as np
        from lucille_tpu.render.renderer import Renderer

        ckpt = str(tmp_path / "frame.ckpt.npz")
        with open(ckpt, "wb") as f:
            np.savez(f, image=np.zeros((8, 8, 3)), done=np.zeros(1, bool),
                     meta=np.asarray([1, 2, 3, 4, 5, 6, 7]))
        state = self._state()
        img = Renderer(state.scene, tile_size=16).render_frame(
            checkpoint=ckpt, recover=True
        )
        assert float(img.max()) > 0.0


class TestCropWindow:
    def test_crop_matches_full_render_subwindow(self):
        """CropWindow pixels are bit-identical to the full render's same
        pixels; everything outside stays black (VERDICT r1 gap #6)."""
        from lucille_tpu.render.renderer import Renderer
        from lucille_tpu.ri.api import RiState
        from lucille_tpu.rib.parser import parse_rib

        def build(crop):
            s = RiState()
            parse_rib(
                'Projection "perspective" "fov" [45]\n'
                + (f"CropWindow {crop}\n" if crop else "")
                + "WorldBegin\n"
                'LightSource "domelight" 1\n'
                'Polygon "P" [ 2 2 4  2 -2 4  -2 -2 4  -2 2 4 ]\n'
                "WorldEnd\n",
                s,
            )
            s.Format(64, 48)
            s.options.render_method = "ao"
            s.options.gather_nsamples = 4
            return s

        full = Renderer(build(None).scene, tile_size=16).render_frame()
        s = build("0.25 0.75 0.25 0.75")
        assert s.camera.crop_window == (0.25, 0.75, 0.25, 0.75)
        crop = Renderer(s.scene, tile_size=16).render_frame()
        assert crop.shape == full.shape
        x0, x1 = 16, 48  # ceil(64*0.25), ceil(64*0.75)
        y0, y1 = 12, 36
        np.testing.assert_array_equal(crop[y0:y1, x0:x1], full[y0:y1, x0:x1])
        outside = crop.copy()
        outside[y0:y1, x0:x1] = 0.0
        assert (outside == 0.0).all()


class TestDofRender:
    def test_dof_blurs_offfocus_edge(self):
        """A quad edge at the focal distance stays sharp; pulling focus
        far behind it blurs the same edge (thin-lens DoF end-to-end)."""
        from lucille_tpu.render.renderer import Renderer
        from lucille_tpu.ri.api import RiState
        from lucille_tpu.rib.parser import parse_rib

        def render(fdist):
            s = RiState()
            # red quad against the default white dome fallback
            # (render.c:516-536): the GREEN channel has a clean 1 -> 0
            # edge at the quad's right border
            parse_rib(
                'Projection "perspective" "fov" [45]\n'
                f"DepthOfField 1.0 0.8 {fdist}\n"
                "WorldBegin\n"
                'Surface "constant"\nColor [1 0 0]\n'
                'Polygon "P" [ 0 2 4  0 -2 4  -3 -2 4  -3 2 4 ]\n'
                "WorldEnd\n",
                s,
            )
            s.Format(64, 48)
            s.options.render_method = "shader"
            return Renderer(s.scene, tile_size=64).render_frame()

        def edge_width(img):
            # scan the middle row across the quad's right edge: count
            # pixels with intermediate coverage (0.05 < v < 0.95)
            row = img[24, :, 1]
            return int(((row > 0.05) & (row < 0.95)).sum())

        sharp = render(4.0)  # quad plane IS the focal plane
        blurred = render(40.0)  # focus far behind the quad
        assert edge_width(sharp) <= 2
        assert edge_width(blurred) >= edge_width(sharp) + 2
