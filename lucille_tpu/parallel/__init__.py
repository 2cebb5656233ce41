"""Scale-out: device meshes and sharded tile rendering.

TPU-native replacement for lucille's parallel substrate (SURVEY.md
section 2.8): the pthread bucket queue (render.c:1043-1207) and the MPI
byte-collective layer (src/base/parallel.c:62-233) both collapse into ONE
mechanism here — static tile sharding over a `jax.sharding.Mesh` with
`shard_map`, XLA collectives for reductions, and host-0 image assembly
(the analog of rank-0 display ownership, render.c:468-514).
"""

from lucille_tpu.parallel.mesh import (
    make_mesh,
    render_frame_sharded,
    sharded_tile_renderer,
)

__all__ = ["make_mesh", "sharded_tile_renderer", "render_frame_sharded"]
