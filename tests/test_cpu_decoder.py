"""Standalone CPU decoder vs the JAX decoder.

The CPU decoder (native/ebcc_cpu_decoder.cc) must reconstruct the same
frames as the device path to float32 lifting tolerance, with the error
bound still satisfied.
"""

import numpy as np
import pytest

import ebcc_tpu
from ebcc_tpu import EBCCConfig, ResidualMode
from ebcc_tpu.runtime import cpu_decoder, native

if not native.HAVE_NATIVE:  # pragma: no cover
    pytest.skip("native runtime not built", allow_module_level=True)

BOUND = 0.1


@pytest.fixture(scope="module")
def codec_pair(small_frame):
    data = np.stack([small_frame, small_frame * 0.99 + 0.5])
    cfg = EBCCConfig(mode=ResidualMode.MAX_ERROR, error=BOUND, base_cr=50,
                     max_batch=2)
    blob = ebcc_tpu.compress(data, cfg)
    return data, cfg, blob


def test_matches_jax_decoder(codec_pair):
    data, cfg, blob = codec_pair
    jax_rec = ebcc_tpu.decompress(blob, cfg)
    cpu_rec = cpu_decoder.decompress(blob)
    rng = float(data.max() - data.min())
    # float32 lifting rounding differences only
    assert float(np.abs(cpu_rec - jax_rec).max()) < 1e-3 * rng


def test_bound_holds_on_cpu_decode(codec_pair):
    data, cfg, blob = codec_pair
    cpu_rec = cpu_decoder.decompress(blob)
    assert float(np.abs(cpu_rec - data).max()) <= BOUND


def test_const_frame(codec_pair):
    _, cfg, _ = codec_pair
    blob = ebcc_tpu.compress(np.full((1, 32, 64), 5.0, np.float32), cfg)
    np.testing.assert_array_equal(cpu_decoder.decompress(blob), 5.0)


def test_decode_backend_cpu_matches_device(small_frame):
    """decompress(decode_backend='cpu') must agree with the device path
    within the codec's cross-implementation tolerance and hold the bound."""
    import dataclasses

    import ebcc_tpu
    from ebcc_tpu.codec.config import EBCCConfig, ResidualMode
    cfg = EBCCConfig(mode=ResidualMode.MAX_ERROR, error=0.1, max_batch=1,
                     decode_backend="device")
    blob = ebcc_tpu.compress(small_frame, cfg)
    rec_dev = ebcc_tpu.decompress(blob, cfg)
    rec_cpu = ebcc_tpu.decompress(
        blob, dataclasses.replace(cfg, decode_backend="cpu"))
    assert rec_cpu.shape == rec_dev.shape
    assert np.abs(rec_cpu[0] - small_frame).max() <= 0.1
    assert np.abs(rec_cpu - rec_dev).max() <= 1e-3
