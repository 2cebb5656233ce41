"""Tools tests: OBJ loader, obj2rib, sisgen, SSS, shell, rockenfield codec."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

CUBE_OBJ = """
v -1 0 -1
v 1 0 -1
v 1 2 -1
v -1 2 -1
v -1 0 1
v 1 0 1
v 1 2 1
v -1 2 1
f 1 2 3 4
f 5 8 7 6
f 1 5 6 2
f 2 6 7 3
f 3 7 8 4
f 4 8 5 1
"""


class TestObjLoader:
    def test_cube(self, tmp_path):
        from lucille_tpu.ri.wavefront import load_obj

        p = tmp_path / "c.obj"
        p.write_text(CUBE_OBJ)
        g = load_obj(p)
        assert g is not None
        assert len(g.positions) == 8
        assert g.ntriangles == 12  # 6 quads fanned

    def test_negative_indices_and_normals(self, tmp_path):
        from lucille_tpu.ri.wavefront import load_obj

        p = tmp_path / "t.obj"
        p.write_text(
            "v 0 0 0\nv 1 0 0\nv 0 1 0\n"
            "vn 0 0 1\n"
            "f -3//-1 -2//-1 -1//-1\n"
        )
        g = load_obj(p)
        assert g.ntriangles == 1
        np.testing.assert_allclose(g.normals, [[0, 0, 1]] * 3)

    def test_obj2rib_renders(self, tmp_path):
        import sys

        sys.path.insert(0, "tools_tpu")
        from obj2rib import obj_to_rib

        from lucille_tpu.render.renderer import Renderer
        from lucille_tpu.ri.api import RiState
        from lucille_tpu.rib.parser import parse_rib

        p = tmp_path / "c.obj"
        p.write_text(CUBE_OBJ)
        rib = obj_to_rib(p, samples=1, gather=4)
        s = RiState()
        parse_rib(rib, s)
        assert s.scene.ntriangles == 12 + 2  # cube + ground plane
        s.Format(32, 24)
        img = Renderer(s.scene, tile_size=32).render_frame()
        assert img.mean() > 0.05


class TestSisgen:
    def test_energy_partition(self):
        import sys

        sys.path.insert(0, "tools_tpu")
        from sisgen import generate_sis_samples

        from lucille_tpu.lights.ibl import latlong_directions

        img = np.full((16, 32, 3), 0.2, dtype=np.float32)
        img[2:4, 6:10] = 20.0  # bright region
        dirs, rgb = generate_sis_samples(img, nsamples=16)
        assert len(dirs) > 0
        np.testing.assert_allclose(
            np.linalg.norm(dirs, axis=-1), 1.0, atol=1e-5
        )
        # total energy conserved: sum of weights == integral of map
        _, solid = latlong_directions(16, 32)
        want = (img.mean(-1) * solid).sum() * 3  # rgb channels equalish
        assert rgb.sum() == pytest.approx(want, rel=0.05)

    def test_brightest_sample_near_hotspot(self):
        import sys

        sys.path.insert(0, "tools_tpu")
        from sisgen import generate_sis_samples

        from lucille_tpu.lights.ibl import latlong_directions

        img = np.full((16, 32, 3), 0.01, dtype=np.float32)
        img[1, 8] = 100.0
        dirs, rgb = generate_sis_samples(img, nsamples=8)
        d_all, _ = latlong_directions(16, 32)
        hot = d_all[1, 8]
        best = rgb.sum(-1).argmax()
        assert np.dot(dirs[best], hot) > 0.9


class TestSSS:
    def test_single_scattering_finite_and_lit(self):
        from lucille_tpu.lights.tables import LightEntry, LightTables
        from lucille_tpu.transport.sss import single_scattering
        from tests.test_transport import _plane_scene

        _, scene, _ = _plane_scene()
        lights = LightTables(
            [
                LightEntry(
                    type="distant",
                    position=(0, 10, 0),
                    direction=(0, -1, 0),
                    color=(1, 1, 1),
                    intensity=5.0,
                )
            ]
        )
        B = 32
        P = jnp.stack(
            [jnp.linspace(-2, 2, B), jnp.zeros(B), jnp.zeros(B)], axis=-1
        )
        N = jnp.broadcast_to(jnp.asarray([0.0, 1.0, 0.0]), (B, 3))
        I = jnp.broadcast_to(
            jnp.asarray([0.3, -1.0, 0.0]) / np.sqrt(1.09), (B, 3)
        )
        out = single_scattering(scene, lights, P, N, I, jax.random.key(0))
        vals = np.asarray(out)
        assert np.isfinite(vals).all()
        assert (vals >= 0).all()
        assert vals.mean() > 0.0

    def test_fdr_formula(self):
        from lucille_tpu.transport.sss import fresnel_diffuse_reflectance

        # sss.c:160-166 formula at eta=1.4
        assert fresnel_diffuse_reflectance(1.4) == pytest.approx(
            -1.440 / 1.96 + 0.710 / 1.4 + 0.668 + 0.0636 * 1.4
        )


class TestRockenfieldCodec:
    def test_preview_renders_ansi(self):
        import sys

        sys.path.insert(0, "tools_tpu")
        from rockenfield import _terminal_preview

        img = np.random.default_rng(0).uniform(0, 1, (24, 32, 3)).astype(np.float32)
        s = _terminal_preview(img, max_cols=16)
        assert "\x1b[38;2;" in s
        assert len(s.splitlines()) > 2


class TestDCCExport:
    """dcc_export's emitter core round-trips through our own RIB parser
    (the bpy/hou adapters need their DCCs; the emission path is shared)."""

    def _meshes(self):
        import numpy as np

        tri = dict(
            positions=np.array([[-1, 0, -1], [1, 0, -1], [0, 2, 0]], float),
            indices=np.array([[0, 1, 2]]),
            name="tri",
            color=(1.0, 0.5, 0.25),
            surface="matte",
            surface_params={"Kd": [0.8]},
        )
        quad = dict(
            positions=np.array(
                [[-5, 0, -5], [5, 0, -5], [5, 0, 5], [-5, 0, 5]], float
            ),
            indices=np.array([[0, 1, 2], [0, 2, 3]]),
            name="floor",
        )
        return [tri, quad]

    def test_round_trip_parses_and_renders(self):
        import numpy as np
        import sys, os
        sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
        from tools_tpu.dcc_export import emit_rib
        from lucille_tpu.rib.parser import parse_rib
        from lucille_tpu.ri.api import RiState
        from lucille_tpu.render.renderer import Renderer

        rib = emit_rib(self._meshes(), width=32, height=24, samples=1)
        state = RiState()
        parse_rib(rib, state)
        assert len(state.scene.geoms) == 2
        assert state.scene.geoms[0].ntriangles == 1
        assert state.scene.geoms[1].ntriangles == 2
        np.testing.assert_allclose(
            state.scene.geoms[0].attrs.color, (1.0, 0.5, 0.25)
        )
        img = Renderer(state.scene, tile_size=16).render_frame()
        assert img.shape == (24, 32, 3)
        assert float(img.max()) > 0.0  # auto-framed camera sees the scene

    def test_explicit_camera_matrix(self):
        import sys, os
        sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
        import numpy as np
        from tools_tpu.dcc_export import emit_rib
        from lucille_tpu.rib.parser import parse_rib
        from lucille_tpu.ri.api import RiState

        w2c = np.eye(4)
        w2c[3, :3] = [0.0, -1.0, -8.0]  # row-vector translation
        rib = emit_rib(
            self._meshes(), camera=dict(world_to_camera=w2c, fov=38.0)
        )
        state = RiState()
        parse_rib(rib, state)
        assert state.camera.fov == 38.0


class TestBVHViz:
    def test_heatmap_and_boxes(self, tmp_path):
        import sys, os
        sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
        import numpy as np
        from tools_tpu.bvh_viz import dump_boxes_obj, heatmap, render_diag
        from tools_tpu.dcc_export import emit_rib

        rib = tmp_path / "scene.rib"
        rib.write_text(
            emit_rib(TestDCCExport()._meshes(), width=24, height=16, samples=1)
        )
        stat, stats, scene = render_diag(str(rib), metric="nvisits")
        assert stat.shape == (16, 24)
        assert stat.max() > 0  # rays walked nodes
        assert stats["ntris"].max() >= 1  # something got tested
        hm = heatmap(stat)
        assert hm.shape == (16, 24, 3)
        assert hm.min() >= 0.0 and hm.max() <= 1.0

        obj = tmp_path / "boxes.obj"
        dump_boxes_obj(scene, str(obj))
        text = obj.read_text()
        nv = sum(1 for line in text.splitlines() if line.startswith("v "))
        nl = sum(1 for line in text.splitlines() if line.startswith("l "))
        assert nv == 8 * scene.n_nodes
        assert nl == 12 * scene.n_nodes


class TestInteractiveViewLoop:
    """The testbed's 'g'-key loop (src/testbed/README.txt:1-10): load a
    scene, move the camera, re-render on demand — scripted through the
    shell, headless."""

    def test_two_viewpoints_of_plane_sphere(self, tmp_path, monkeypatch):
        import os

        import numpy as np

        from lucille_tpu.imageio.rgbe import read_hdr
        from lucille_tpu.shell import Shell

        rib = "/root/reference/examples/plane_sphere/Scene_DEFAULT_Set0.rib"
        if not os.path.exists(rib):
            import pytest

            pytest.skip("reference tree unavailable")
        monkeypatch.chdir(os.path.dirname(rib))
        sh = Shell()
        out1 = str(tmp_path / "v1.hdr")
        out2 = str(tmp_path / "v2.hdr")
        view = str(tmp_path / "saved_view")
        for line in (
            f"file {rib}",
            "format 48 32",
            "nsamples 9",
            f"view save {view}",     # 'e': save view
            f"g {out1}",             # 'g': render from current view
            "view orbit 35 10",      # navigate
            "view dolly 0.5",
            f"g {out2}",             # 'g' again from the new view
        ):
            assert sh.one(line) is True
        img1 = read_hdr(out1)
        img2 = read_hdr(out2)
        assert img1.shape == (32, 48, 3) and np.isfinite(img1).all()
        assert img1.mean() > 0 and img2.mean() > 0
        # a 35-degree orbit moves the image content
        assert np.abs(img1 - img2).mean() > 1e-3
        # 's': restoring the saved view reproduces viewpoint 1 exactly
        out3 = str(tmp_path / "v3.hdr")
        assert sh.one(f"view load {view}") is True
        assert sh.one(f"g {out3}") is True
        np.testing.assert_array_equal(read_hdr(out3), img1)
