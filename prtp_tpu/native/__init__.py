"""Native (C++) host-pipeline accelerators, loaded via ctypes.

The shared library is built lazily from source with the system g++
(``-O3 -shared -fPIC``) and cached next to the source; every entry
point has a pure-Python fallback so the package works without a
toolchain.
"""

from .raster import rasterize_paths_native, native_available  # noqa: F401
