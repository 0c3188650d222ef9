"""Native host-runtime components (C++, loaded via ctypes).

Build is lazy and cached; every consumer has a pure-Python fallback, so the
framework works without a toolchain — with the native path it is ~100x
faster on the host-bound bitstream loops.
"""

from academicodec_tpu.native.build import get_bitpack_lib
