"""Host-side runtime: native (C++) entropy stage and bitstream repacking.

See :mod:`ebcc_tpu.runtime.native`.  The device-side runtime is XLA itself;
what the reference implements as a native C library around the codec
(/root/reference/src/j2k_codec.h) maps here to (a) XLA programs for compute
and (b) this thin native host layer for byte-level work.
"""

from . import native

__all__ = ["native"]
