"""DWT property tests: perfect reconstruction + agreement with a direct
NumPy port of the reference lifting semantics (dwt.h:81-250)."""

import numpy as np
import jax.numpy as jnp

from ebcc_tpu.ops import dwt, frame

ALPHA, BETA, GAMMA, DELTA, XI = (
    dwt.ALPHA, dwt.BETA, dwt.GAMMA, dwt.DELTA, dwt.XI)


def np_dwt_row(row):
    """Literal (scalar) implementation of the reference's dwt_row."""
    n = row.shape[0]
    t = np.zeros_like(row)
    for x in range(n // 2 - 1):
        t[n // 2 + x] = row[2 * x + 1] + ALPHA * (row[2 * x] + row[2 * x + 2])
    t[n - 1] = row[n - 1] + 2 * ALPHA * row[n - 2]
    t[0] = row[0] + BETA * (t[n // 2] + t[n // 2 + 1])
    for x in range(1, n // 2):
        t[x] = row[2 * x] + BETA * (t[n // 2 + x] + t[n // 2 + x - 1])
    for x in range(n // 2 - 1):
        t[n // 2 + x] += GAMMA * (t[x] + t[x + 1])
    t[n - 1] += GAMMA * (t[n // 2 - 1] + t[n // 2 - 2])
    t[0] += DELTA * (t[n // 2] + t[n // 2 + 1])
    for x in range(1, n // 2):
        t[x] += DELTA * (t[n // 2 + x] + t[n // 2 + x - 1])
    for x in range(n // 2):
        t[x] *= XI
        t[n // 2 + x] /= XI
    return t


def test_dwt1d_matches_reference_lifting():
    rng = np.random.default_rng(1)
    row = rng.normal(size=64).astype(np.float64)
    ours = np.asarray(dwt.dwt1d(jnp.asarray(row)))
    ref = np_dwt_row(row.copy())
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-5)


def test_dwt1d_roundtrip():
    rng = np.random.default_rng(2)
    x = rng.normal(size=(3, 128)).astype(np.float32)
    y = dwt.idwt1d(dwt.dwt1d(jnp.asarray(x)))
    np.testing.assert_allclose(np.asarray(y), x, atol=1e-4)


def test_dwt2d_multi_roundtrip(small_frame):
    levels = 3
    x = frame.pad_symmetric(jnp.asarray(small_frame)[None], levels)
    c = dwt.dwt2d_multi(x, levels)
    y = dwt.idwt2d_multi(c, levels)
    np.testing.assert_allclose(np.asarray(y), np.asarray(x), atol=1e-2)


def test_pad_symmetric_matches_reference(small_frame):
    """Padding mirrors load_image (dwt.h:61-70): right/bottom symmetric,
    corner zero."""
    levels = 3
    x = np.asarray(small_frame[:94, :150], dtype=np.float32)
    h, w = x.shape
    hp = frame.padded_size(h, levels)
    wp = frame.padded_size(w, levels)
    out = np.asarray(frame.pad_symmetric(jnp.asarray(x)[None], levels))[0]
    assert out.shape == (hp, wp)
    ref = np.zeros((hp, wp), np.float32)
    ref[:h, :w] = x
    for y in range(h):
        for xx in range(wp - w):
            ref[y, w + xx] = ref[y, w - xx - 1]
    for xx in range(w):
        for y in range(hp - h):
            ref[h + y, xx] = ref[h - y - 1, xx]
    np.testing.assert_array_equal(out, ref)


def test_energy_roughly_preserved(small_frame):
    levels = 3
    x = frame.pad_symmetric(jnp.asarray(small_frame)[None] - 260.0, levels)
    c = dwt.dwt2d_multi(x, levels)
    ex = float(jnp.sum(x * x))
    ec = float(jnp.sum(c * c))
    assert 0.3 < ec / ex < 3.5


def test_vertical_matches_transposed():
    """The axis-direct column lifting (dwt1d_v / idwt1d_v) is BIT-identical
    to the transpose-sandwich form it replaced — the 2-D transforms (and
    therefore every stream byte) are unchanged by the layout optimisation."""
    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.standard_normal((3, 64, 96)).astype(np.float32))
    np.testing.assert_array_equal(
        np.asarray(dwt._along_cols(dwt.dwt1d, x)),
        np.asarray(dwt.dwt1d_v(x)))
    np.testing.assert_array_equal(
        np.asarray(dwt._along_cols(dwt.idwt1d, x)),
        np.asarray(dwt.idwt1d_v(x)))
