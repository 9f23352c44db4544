"""Video-baseline codec and driver (reference parity:
ebcc_wrapper/video_wrapper.py + scripts/era5_video_compress.py).

Gated on an ffmpeg binary; this image ships without one, so these skip
here and run wherever the baseline is actually usable.
"""

import importlib.util
import os
import subprocess
import sys

import numpy as np
import pytest

from ebcc_tpu.models import video

pytestmark = pytest.mark.skipif(not video.available(),
                                reason="ffmpeg not installed")

_DRIVER = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "scripts", "era5_video_compress.py")


def _frames(n=4, h=64, w=96):
    rng = np.random.default_rng(0)
    y, x = np.mgrid[0:h, 0:w]
    base = (0.5 + 0.4 * np.sin(y / h * np.pi) *
            np.cos(x / w * 2 * np.pi)).astype(np.float32)
    return np.clip(np.stack([
        base + rng.normal(0, 0.01, base.shape).astype(np.float32)
        for _ in range(n)]), 0.0, 1.0)


def test_video_roundtrip_compresses():
    data = _frames()
    comp = video.VideoArrayCompressor(codec="x264", crf=18)
    blob = comp.compress(data)
    rec = comp.decompress(blob)
    assert rec.shape == data.shape
    assert len(blob) < data.nbytes            # actually compresses
    assert float(np.abs(rec - data).max()) < 0.25  # lossy but sane


def test_video_blob_magic_rejected():
    comp = video.VideoArrayCompressor()
    with pytest.raises(ValueError):
        comp.decompress(b"XXXX" + b"\x00" * 16)


def test_era5_video_driver_rows():
    spec = importlib.util.spec_from_file_location("evc", _DRIVER)
    m = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(m)
    data = (_frames() * 30 + 250).astype(np.float32)  # kelvin-ish scale
    vrow = m.video_row(data, "x264", 18)
    assert vrow["cr"] > 1.0 and vrow["max_abs_error"] > 0.0
    erow = m.ebcc_row(data, vrow["max_abs_error"])
    assert erow["max_abs_error"] <= vrow["max_abs_error"]


def test_era5_video_driver_cli(tmp_path):
    npy = tmp_path / "frames.npy"
    np.save(npy, (_frames(2) * 30 + 250).astype(np.float32))
    r = subprocess.run([sys.executable, _DRIVER, "--input", str(npy),
                        "--steps", "2", "--no-ebcc", "--json"],
                       capture_output=True, text=True)
    assert r.returncode == 0, r.stderr
    assert '"cr"' in r.stdout
