"""Fuzz the untrusted-input decode surfaces.

The container and its streams are untrusted file content (the HDF5 plugin
decodes whatever is on disk).  Mutated and truncated containers must
produce clean Python exceptions — never a crash of the native decoder
(a segfault would take pytest down with it) and never a silent
plausible-looking decode of a stream whose declared sizes aren't backed
by bytes.
"""

from struct import error as struct_error

import numpy as np
import pytest

import ebcc_tpu
from ebcc_tpu.codec.config import EBCCConfig, ResidualMode
from ebcc_tpu.runtime import cpu_decoder
from ebcc_tpu.runtime import native as _native

pytestmark = pytest.mark.skipif(not _native.HAVE_NATIVE,
                                reason="native runtime not built")


@pytest.fixture(scope="module")
def valid_blob(small_frame):
    cfg = EBCCConfig(mode=ResidualMode.MAX_ERROR, error=0.1, max_batch=1)
    return ebcc_tpu.compress(small_frame, cfg)


def test_truncations_fail_cleanly(valid_blob):
    """Every strict prefix removes declared bytes (the stream sizes are
    all accounted in the container), so every truncation must RAISE — a
    silent plausible-looking decode of a short stream would break the
    bound contract."""
    rng = np.random.default_rng(0)
    cuts = sorted(set(rng.integers(1, len(valid_blob), 40).tolist()))
    for cut in cuts:
        with pytest.raises((ValueError, RuntimeError, struct_error)):
            cpu_decoder.decompress(valid_blob[:cut])


def test_bitflips_fail_cleanly_or_stay_sane(valid_blob):
    rng = np.random.default_rng(1)
    buf = bytearray(valid_blob)
    for _ in range(60):
        pos = int(rng.integers(0, len(buf)))
        bit = 1 << int(rng.integers(0, 8))
        mutated = bytearray(buf)
        mutated[pos] ^= bit
        try:
            out = cpu_decoder.decompress(bytes(mutated))
            # decodes that survive must at least be the right shape and
            # finite-or-detectable (a flipped stream bit is VALID content
            # by design — the bound no longer applies, but the decoder
            # must not produce NaN from integer state)
            assert out.shape[-2:] == (96, 160)
        except (ValueError, RuntimeError, OverflowError, MemoryError):
            pass


def test_header_field_fuzz(valid_blob):
    """Mutate each byte of the frame header region specifically (the
    highest-leverage untrusted fields: dims, levels, plane counts,
    stream sizes)."""
    for pos in range(8, min(64, len(valid_blob))):
        for val in (0x00, 0x7F, 0xFF):
            mutated = bytearray(valid_blob)
            mutated[pos] = val
            try:
                out = cpu_decoder.decompress(bytes(mutated))
            except (ValueError, RuntimeError, OverflowError, MemoryError,
                    struct_error):
                continue
            # mutations that survive decode must still be shape-sane
            # (mutated mn/mx/dc floats legitimately change values only)
            assert out.ndim == 3 and out.size > 0


def test_patch_decoder_fuzz():
    """Corrupted exact-value patch streams must fail with a clean error
    (never hang, crash, or size a huge allocation).  Covers every method
    id including the new block-coded / overflow-delta decoders."""
    import numpy as np

    from ebcc_tpu.models.direct import DirectCompressor

    rng = np.random.default_rng(11)
    npoints = 4096
    idx = np.sort(rng.choice(npoints, 64, replace=False)).astype(np.int64)
    vals = rng.normal(size=64).astype(np.float32)
    good = DirectCompressor._encode_patch(idx, vals, npoints)
    for trial in range(300):
        mutated = bytearray(good)
        for _ in range(rng.integers(1, 4)):
            mutated[rng.integers(0, len(mutated))] = rng.integers(0, 256)
        try:
            got_idx, got_vals, _ = DirectCompressor._decode_patch(
                bytes(mutated), 0, npoints)
            assert len(got_idx) == len(got_vals)
        except (ValueError, RuntimeError, OverflowError, MemoryError,
                IndexError, KeyError, struct_error):
            continue
    # truncated buffers
    for cut in range(0, len(good), 7):
        try:
            DirectCompressor._decode_patch(good[:cut], 0, npoints)
        except (ValueError, RuntimeError, OverflowError, MemoryError,
                IndexError, KeyError, struct_error):
            continue
