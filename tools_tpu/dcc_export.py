"""DCC exporters: Blender and Houdini scene -> RIB.

Parity with the reference's exporter ecosystem (exporters/houdini/htol.py
— Houdini SOP geometry to RIB over `hou`; tools/blender/blenderman.py /
pantalone.py — Blender export scripts): one module with a DCC-agnostic
RIB emitter core plus thin adapters over each application's Python API.

The emitter core (`emit_rib`) is pure Python/NumPy and unit-tested by
round-tripping through lucille_tpu's own RIB parser; the `bpy`/`hou`
adapters run inside the respective DCC:

    # Blender (Text Editor or --python):
    import tools_tpu.dcc_export as dcc
    dcc.export_blender("/tmp/scene.rib")

    # Houdini (Python shell):
    import tools_tpu.dcc_export as dcc
    dcc.export_houdini("/tmp/scene.rib", "/obj/geo1")

Both emit PointsPolygons triangle meshes, per-object Color/Surface
attributes, and the active camera (perspective fov + world-to-camera
transform), matching what the lucille_tpu front-end consumes.
"""

from __future__ import annotations

import math
import sys

import numpy as np


def _fmt(a, nd=6):
    return " ".join(f"{float(v):.{nd}f}" for v in np.asarray(a).reshape(-1))


def emit_rib(
    meshes,
    camera=None,
    width=640,
    height=480,
    output="scene.hdr",
    samples=2,
    gather=64,
    method=None,
    fov=45.0,
) -> str:
    """DCC-agnostic RIB emission.

    meshes: list of dicts with keys
        positions (N, 3) float, indices (F, 3) int, and optionally
        name (str), color (3,), surface (str), surface_params (dict).
    camera: optional dict with world_to_camera (4, 4) row-vector matrix
        and fov (deg); None frames the scene bounds automatically.
    """
    lines = [
        "# RIB exported by lucille_tpu dcc_export",
        f'Display "{output}" "file" "rgb"',
        f"Format {int(width)} {int(height)} 1",
        f"PixelSamples {int(samples)} {int(samples)}",
        f'Option "raytrace" "int finalgather_rays" [{int(gather)}]',
    ]
    if method:
        lines.append(f'Option "renderer" "string method" ["{method}"]')

    if camera is None:
        allp = (
            np.concatenate([np.asarray(m["positions"]) for m in meshes])
            if meshes
            else np.zeros((1, 3))
        )
        center = 0.5 * (allp.min(axis=0) + allp.max(axis=0))
        radius = float(np.linalg.norm(allp.max(axis=0) - allp.min(axis=0))) * 0.5
        dist = radius / math.tan(math.radians(fov) * 0.5) * 1.4 + 1e-3
        lines += [
            f'Projection "perspective" "fov" [{fov:g}]',
            'Orientation "rh"',
            "ConcatTransform [1 0 0 0  0 1 0 0  0 0 1 0  "
            f"{_fmt([-center[0], -center[1], -(center[2] + dist)])} 1]",
        ]
    else:
        lines += [
            f'Projection "perspective" "fov" [{camera.get("fov", fov):g}]',
            'Orientation "rh"',
            "ConcatTransform ["
            + _fmt(np.asarray(camera["world_to_camera"]))
            + "]",
        ]

    lines.append("WorldBegin")
    for m in meshes:
        P = np.asarray(m["positions"], dtype=np.float64)
        idx = np.asarray(m["indices"], dtype=np.int64).reshape(-1, 3)
        lines.append("AttributeBegin")
        if m.get("name"):
            lines.append(f'Attribute "identifier" "name" ["{m["name"]}"]')
        if m.get("color") is not None:
            lines.append(f"Color [{_fmt(m['color'], 4)}]")
        if m.get("surface"):
            params = "".join(
                f' "{k}" [{_fmt(v, 4)}]'
                for k, v in (m.get("surface_params") or {}).items()
            )
            lines.append(f'Surface "{m["surface"]}"{params}')
        nverts = " ".join("3" for _ in range(len(idx)))
        lines.append(
            f"PointsPolygons [{nverts}] [{' '.join(str(int(i)) for i in idx.reshape(-1))}] "
            f'"P" [{_fmt(P)}]'
        )
        lines.append("AttributeEnd")
    lines.append("WorldEnd")
    return "\n".join(lines) + "\n"


# ---------------------------------------------------------------------------
# Blender adapter (tools/blender/blenderman.py counterpart)
# ---------------------------------------------------------------------------


def export_blender(filepath, scene=None, **kwargs) -> str:
    """Export the current Blender scene's mesh objects + active camera.
    Must run inside Blender (imports bpy)."""
    try:
        import bpy  # noqa: F401
    except ImportError as e:  # pragma: no cover - needs Blender
        raise RuntimeError(
            "export_blender must run inside Blender (no bpy module)"
        ) from e

    scene = scene or bpy.context.scene
    deps = bpy.context.evaluated_depsgraph_get()
    meshes = []
    for obj in scene.objects:
        if obj.type != "MESH":
            continue
        ev = obj.evaluated_get(deps)
        me = ev.to_mesh()
        me.calc_loop_triangles()
        mw = np.asarray(obj.matrix_world, dtype=np.float64)  # column-major 4x4
        verts = np.asarray([v.co[:] for v in me.vertices], dtype=np.float64)
        if len(verts) == 0:
            ev.to_mesh_clear()
            continue
        hom = np.concatenate([verts, np.ones((len(verts), 1))], axis=1)
        world = (mw @ hom.T).T[:, :3]
        tris = np.asarray(
            [lt.vertices[:] for lt in me.loop_triangles], dtype=np.int64
        )
        color = None
        if obj.active_material is not None:
            color = list(obj.active_material.diffuse_color[:3])
        meshes.append(
            dict(positions=world, indices=tris, name=obj.name, color=color)
        )
        ev.to_mesh_clear()

    camera = None
    if scene.camera is not None:
        cam = scene.camera
        # Blender camera looks down -Z of its own frame; RenderMan camera
        # looks down +Z (rh) — flip Z, then invert the world matrix
        w2c = np.linalg.inv(np.asarray(cam.matrix_world, dtype=np.float64))
        flip = np.diag([1.0, 1.0, -1.0, 1.0])
        w2c = flip @ w2c
        camera = dict(
            world_to_camera=w2c.T,  # RIB ConcatTransform is row-vector
            fov=math.degrees(cam.data.angle),
        )

    rib = emit_rib(meshes, camera=camera, **kwargs)
    with open(filepath, "w") as f:
        f.write(rib)
    return filepath


# ---------------------------------------------------------------------------
# Houdini adapter (exporters/houdini/htol.py counterpart)
# ---------------------------------------------------------------------------


def export_houdini(filepath, node_path=None, **kwargs) -> str:
    """Export a Houdini SOP's geometry (triangulated) + the scene camera.
    Must run inside Houdini (imports hou)."""
    try:
        import hou  # noqa: F401
    except ImportError as e:  # pragma: no cover - needs Houdini
        raise RuntimeError(
            "export_houdini must run inside Houdini (no hou module)"
        ) from e

    nodes = (
        [hou.node(node_path)]
        if node_path
        else [n for n in hou.node("/obj").children() if n.type().name() == "geo"]
    )
    meshes = []
    for node in nodes:
        if node is None:
            continue
        geo = node.displayNode().geometry()
        pts = np.asarray([p.position() for p in geo.points()], dtype=np.float64)
        tris = []
        for prim in geo.prims():
            vts = [v.point().number() for v in prim.vertices()]
            for k in range(1, len(vts) - 1):  # fan-triangulate polygons
                tris.append((vts[0], vts[k], vts[k + 1]))
        if not tris:
            continue
        meshes.append(
            dict(
                positions=pts,
                indices=np.asarray(tris, dtype=np.int64),
                name=node.name(),
            )
        )

    camera = None
    cams = [n for n in hou.node("/obj").children() if n.type().name() == "cam"]
    if cams:
        cam = cams[0]
        w2c = np.asarray(cam.worldTransform().inverted().asTuple()).reshape(4, 4)
        flip = np.diag([1.0, 1.0, -1.0, 1.0])
        aperture = cam.parm("aperture").eval()
        focal = cam.parm("focal").eval()
        fov = math.degrees(2.0 * math.atan(aperture / (2.0 * focal)))
        camera = dict(world_to_camera=w2c @ flip, fov=fov)

    rib = emit_rib(meshes, camera=camera, **kwargs)
    with open(filepath, "w") as f:
        f.write(rib)
    return filepath


if __name__ == "__main__":  # pragma: no cover
    print(
        "dcc_export is a DCC-side module: run export_blender()/export_houdini() "
        "inside Blender or Houdini.",
        file=sys.stderr,
    )
    sys.exit(1)
