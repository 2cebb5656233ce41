"""Native (C++) components, loaded via ctypes with on-demand compilation.

The reference's runtime core is native C (SURVEY.md section 2); here the
device compute path is JAX/XLA, and native code covers the host-side hot
spots — currently the binned-SAH BVH builder (native/bvh_builder.cpp).
The shared library is compiled once with g++ into a cache directory; all
callers fall back to the pure-NumPy implementations when no toolchain is
available, so the framework never hard-depends on a compiler at runtime.
"""

from lucille_tpu.native.loader import get_bvh_lib, native_build_bvh

__all__ = ["get_bvh_lib", "native_build_bvh"]
