"""Generate a C driver that replays a RIB scene through lucille's Ri* API.

The reference's RIB front-end needs flex/bison (absent in this image), but
its libraries compile with plain gcc.  This tool turns a RIB file into a
C main() of direct Ri* calls so CPU-lucille can render the bundled scenes
and produce golden HDRs for parity testing (BASELINE.md: baselines must be
established by building/running lucille on the bundled scenes).

Usage:
    python tests/golden/gen_ri_driver.py scene.rib out.c [--format W H]

Only the commands the bundled scenes use are emitted (Display,
PixelSamples, Projection, Orientation, ConcatTransform, Transform,
AttributeBegin/End, Surface, PointsPolygons, WorldBegin/End, Format).
"""

from __future__ import annotations

import sys

import numpy as np

sys.path.insert(0, ".")

from lucille_tpu.rib.lexer import TokenKind, tokenize, read_rib_text  # noqa: E402
from lucille_tpu.rib.parser import _Cursor, _split_params  # noqa: E402


def carr(vals, fmt=None):
    if fmt == "%d":
        return ", ".join("%d" % v for v in vals)
    # exponent form always parses as a float constant ("1f" would not)
    return ", ".join("%.9ef" % v for v in vals)


def _flatten_archives(rib_path, depth=0, root=None) -> str:
    """Inline ReadArchive includes (the C driver has no RIB parser).
    Archive names resolve against the TOP scene's directory tree."""
    import re
    from pathlib import Path

    rib_path = Path(rib_path)
    if root is None:
        root = rib_path.parent
    text = read_rib_text(rib_path)
    if depth > 8:
        return text

    def repl(m):
        name = m.group(1)
        for sub in (
            "", "Archives", "Archives/Scenes", "Archives/Objects",
            "Archives/Cameras", "Archives/Lights", "Archives/Geometry",
            "Archives/Geometry/Cache", "Archives/Materials", "Archives/Groups",
        ):
            cand = Path(root) / sub / name
            if cand.exists():
                return _flatten_archives(cand, depth + 1, root)
        return f"# missing archive {name}"

    return re.sub(r'ReadArchive\s+"([^"]+)"', repl, text)


def gen(rib_path: str, out_path: str, format_wh=None) -> None:
    text = _flatten_archives(rib_path)
    cur = _Cursor(list(tokenize(text)))
    lines = [
        '#include "ri.h"',
        "#include <stdio.h>",
        "static RtToken tok[16]; static RtPointer val[16];",
        "int main(int argc, char **argv) {",
        "  (void)argc; (void)argv;",
        "  RiBegin(RI_NULL);",
    ]
    n_arr = 0
    if format_wh:
        lines.append(f"  RiFormat({format_wh[0]}, {format_wh[1]}, 1.0f);")

    def emit_param_call(fn_name, pos_args, params):
        nonlocal n_arr
        decls = []
        setters = []
        np_emitted = 0
        for k, v in params.items():
            base = k.split()[-1]
            name = f"p{n_arr}"
            n_arr += 1
            vals = v if isinstance(v, list) else [v]
            if vals and isinstance(vals[0], str):
                # string param: params[i] points to a char* (RtToken*)
                sval = str(vals[0]).replace('"', '\\"')
                decls.append(f'  static char *{name} = "{sval}";')
                setters.append(
                    f'  tok[{np_emitted}] = "{base}"; '
                    f"val[{np_emitted}] = (RtPointer)&{name};"
                )
            else:
                arr = np.asarray(vals, dtype=np.float64).reshape(-1)
                decls.append(f"  static RtFloat {name}[] = {{ {carr(arr)} }};")
                setters.append(
                    f'  tok[{np_emitted}] = "{base}"; '
                    f"val[{np_emitted}] = (RtPointer){name};"
                )
            np_emitted += 1
        lines.extend(decls)
        lines.extend(setters)
        lines.append(
            f"  {fn_name}({', '.join(pos_args)}, {np_emitted}, tok, val);"
        )

    while True:
        t = cur.next()
        if t is None:
            break
        if t.kind != TokenKind.ID:
            continue
        name = t.value
        args = cur.collect_args()
        if name == "Display":
            pos, params = _split_params(args, 3)
            lines.append(
                f'  RiDisplay("{pos[0]}", "{pos[1]}", "{pos[2]}", RI_NULL);'
            )
        elif name == "PixelSamples":
            lines.append(f"  RiPixelSamples({args[0]}f, {args[1]}f);")
        elif name == "Shutter":
            lines.append(f"  RiShutter({args[0]}f, {args[1]}f);")
        elif name == "Format" and not format_wh:
            lines.append(f"  RiFormat({int(args[0])}, {int(args[1])}, 1.0f);")
        elif name == "Projection":
            pos, params = _split_params(args, 1)
            fov = np.asarray(params.get("fov", [90.0])).reshape(-1)[0]
            n_arr += 1
            lines.append(f"  static RtFloat fov{n_arr}[] = {{ {fov}f }};")
            lines.append(
                f'  tok[0] = "fov"; val[0] = (RtPointer)fov{n_arr};'
            )
            lines.append(f'  RiProjectionV("{pos[0]}", 1, tok, val);')
        elif name == "Orientation":
            lines.append(f'  RiOrientation("{args[0]}");')
        elif name in ("ConcatTransform", "Transform"):
            m = np.asarray(args[0], dtype=np.float64).reshape(4, 4)
            rows = ", ".join(
                "{ " + carr(m[r]) + " }" for r in range(4)
            )
            n_arr += 1
            lines.append(f"  static RtMatrix m{n_arr} = {{ {rows} }};")
            lines.append(f"  Ri{name}(m{n_arr});")
        elif name == "WorldBegin":
            lines.append("  RiWorldBegin();")
        elif name == "WorldEnd":
            lines.append("  RiWorldEnd();")
        elif name == "AttributeBegin":
            lines.append("  RiAttributeBegin();")
        elif name == "AttributeEnd":
            lines.append("  RiAttributeEnd();")
        elif name == "Surface":
            pos, params = _split_params(args, 1)
            lines.append(f'  RiSurfaceV("{pos[0]}", 0, tok, val);')
        elif name in ("AreaLightSource", "LightSource"):
            # drives lightsource.c's sunsky/dome/distant creation so the
            # reference's sunsky-AO branch (ambientocclusion.c:154-332)
            # renders golden frames
            pos, params = _split_params(args, 2)
            emit_param_call(f"Ri{name}V", [f'"{pos[0]}"'], params)
        elif name == "Option":
            pos, params = _split_params(args, 1)
            emit_param_call("RiOptionV", [f'"{pos[0]}"'], params)
        elif name == "PointsPolygons":
            pos, params = _split_params(args, 2)
            nverts = np.asarray(pos[0], dtype=np.int64)
            verts = np.asarray(pos[1], dtype=np.int64)
            n_arr += 1
            lines.append(
                f"  static RtInt nv{n_arr}[] = {{ {carr(nverts, '%d')} }};"
            )
            lines.append(
                f"  static RtInt vi{n_arr}[] = {{ {carr(verts, '%d')} }};"
            )
            pl = {k: v for k, v in params.items()}
            decls = []
            setters = []
            np_params = 0
            for k, v in pl.items():
                base = k.split()[-1]
                arr = np.asarray(v, dtype=np.float64).reshape(-1)
                pname = f"pp{n_arr}_{np_params}"
                decls.append(f"  static RtFloat {pname}[] = {{ {carr(arr)} }};")
                setters.append(
                    f'  tok[{np_params}] = "{base}"; val[{np_params}] = (RtPointer){pname};'
                )
                np_params += 1
            lines.extend(decls)
            lines.extend(setters)
            lines.append(
                f"  RiPointsPolygonsV({len(nverts)}, nv{n_arr}, vi{n_arr}, "
                f"{np_params}, tok, val);"
            )
    lines.append("  RiEnd();")
    lines.append("  return 0;")
    lines.append("}")
    with open(out_path, "w") as f:
        f.write("\n".join(lines) + "\n")
    print(f"wrote {out_path}")


if __name__ == "__main__":
    fmt = None
    argv = sys.argv[1:]
    if "--format" in argv:
        i = argv.index("--format")
        fmt = (int(argv[i + 1]), int(argv[i + 2]))
        argv = argv[:i] + argv[i + 3 :]
    gen(argv[0], argv[1], fmt)
