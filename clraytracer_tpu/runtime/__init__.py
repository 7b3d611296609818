"""Native runtime: C++ hot paths behind ctypes.

The reference's host runtime is C++ throughout (asset import, BVH build —
AssetManager.cpp, BVH.cpp); here the equivalents live in
``runtime/native/*.cpp``, compiled on demand with g++ into a cached shared
library and bound via ctypes. Every native path has a pure-Python fallback,
so the framework works without a toolchain.
"""

from clraytracer_tpu.runtime.build import native_available, native_lib  # noqa: F401
