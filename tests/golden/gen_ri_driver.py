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


WHITTED_BENCH = r"""
  {
    whitted_arg_t args[2];
    pthread_t th[2];
    int ti;
    ri_render_t *render = ri_render_get();
    unsigned long long rays0 = render->stat.nrays;
    double t0 = wallnow();
    for (ti = 0; ti < 2; ti++) {
      args[ti].tid = ti;
      pthread_create(&th[ti], 0, whitted_rows, &args[ti]);
    }
    for (ti = 0; ti < 2; ti++) pthread_join(th[ti], 0);
    {
      double dt = wallnow() - t0;
      unsigned long long rays = render->stat.nrays - rays0;
      printf("WHITTED_BASELINE rays=%llu seconds=%.6f mrays=%.6f\n",
             rays, dt, rays / dt / 1e6);
    }
  }
"""


def gen(rib_path: str, out_path: str, format_wh=None,
        bench_whitted=False) -> None:
    text = _flatten_archives(rib_path)
    cur = _Cursor(list(tokenize(text)))
    lines = [
        '#include "ri.h"',
        "#include <stdio.h>",
        "static RtToken tok[16]; static RtPointer val[16];",
    ]
    if bench_whitted:
        lines += [
            '#include <pthread.h>',
            '#include <sys/time.h>',
            '#include "render.h"',
            '#include "scene.h"',
            '#include "whitted.h"',
            '#include "camera.h"',
            '#include "option.h"',
            "static double wallnow(void) { struct timeval tv; "
            "gettimeofday(&tv, 0); return tv.tv_sec + 1e-6 * tv.tv_usec; }",
            "typedef struct { int tid; } whitted_arg_t;",
            "static void *whitted_rows(void *p) {",
            "  int tid = ((whitted_arg_t *)p)->tid;",
            "  ri_render_t *render = ri_render_get();",
            "  ri_camera_t *camera = render->context->option->camera;",
            "  ri_display_t *disp = "
            "ri_option_get_curr_display(render->context->option);",
            "  int w = camera->horizontal_resolution;",
            "  int h = camera->vertical_resolution;",
            "  int xsamples = (int)disp->sampling_rates[0];",
            "  int ysamples = (int)disp->sampling_rates[1];",
            "  int x, y, xs, ys;",
            "  ri_ray_t ray; ri_transport_info_t result;",
            "  ri_vector_t from, dir;",
            "  for (y = tid; y < h; y += 2) {",
            "    for (x = 0; x < w; x++) {",
            "      for (ys = 0; ys < ysamples; ys++) {",
            "        for (xs = 0; xs < xsamples; xs++) {",
            "          ri_camera_get_pos_and_dir(from, dir, camera,",
            "              (ri_float_t)(x + (xs + 0.5) / xsamples),",
            "              (ri_float_t)(y + (ys + 0.5) / ysamples));",
            "          ri_vector_copy(ray.org, from);",
            "          ri_vector_copy(ray.dir, dir);",
            "          ri_vector_normalize(ray.dir);",
            "          ray.d = 3; ray.i = 0; ray.thread_num = tid;",
            "          ri_transport_whitted(render, &ray, &result);",
            "        }",
            "      }",
            "    }",
            "  }",
            "  return 0;",
            "}",
    ]
    lines += [
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
            if bench_whitted:
                lines.append("  ri_render_get()->context->world_block--;")
                lines.append("  ri_render_setup(ri_render_get());")
                lines.append("  ri_scene_setup(ri_render_get()->scene);")
                lines.append(
                    "  ri_camera_setup("
                    "ri_render_get()->context->option->camera);"
                )
            else:
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
    if bench_whitted:
        # a timed ri_transport_whitted sweep over every subpixel.  The
        # reference hard-codes AO at render.c:803 (whitted is commented
        # out there), so the only way to measure its whitted transport
        # is to drive it directly: replicate ri_render_frame's setup
        # phase (render.c: ri_render_setup + ri_scene_setup +
        # ri_camera_setup — WorldEnd can't be used because
        # render_frame_cleanup frees the scene), then sweep every
        # subpixel with the subsample() ray setup (render.c:760-800) and
        # raytrace.c:96 ray counting (render->stat.nrays).  Two pthreads
        # to match the AO baseline's threading.
        lines.append(WHITTED_BENCH)
    lines.append("  RiEnd();")
    lines.append("  return 0;")
    lines.append("}")
    with open(out_path, "w") as f:
        f.write("\n".join(lines) + "\n")
    print(f"wrote {out_path}")


if __name__ == "__main__":
    fmt = None
    argv = sys.argv[1:]
    bench_whitted = "--bench-whitted" in argv
    if bench_whitted:
        argv.remove("--bench-whitted")
    if "--format" in argv:
        i = argv.index("--format")
        fmt = (int(argv[i + 1]), int(argv[i + 2]))
        argv = argv[:i] + argv[i + 3 :]
    gen(argv[0], argv[1], fmt, bench_whitted)
