"""Error-metric parity checks (reference: j2k_codec.h:237-303)."""

import numpy as np

from ebcc_tpu.ops import metrics


def test_metrics_basic():
    rng = np.random.default_rng(0)
    x = rng.normal(100, 10, (2, 16, 32)).astype(np.float32)
    y = x + rng.uniform(-0.5, 0.5, x.shape).astype(np.float32)

    r = np.asarray(metrics.data_range(x))
    assert np.allclose(r, x.max(axis=(1, 2)) - x.min(axis=(1, 2)))

    me = np.asarray(metrics.max_error(x, y))
    assert np.allclose(me, np.abs(x - y).max(axis=(1, 2)))

    mre = np.asarray(metrics.max_relative_error(x, y))
    assert np.allclose(mre, me / r)

    q = np.asarray(metrics.error_quantile(x, y, 0.25))
    assert np.allclose(q, (np.abs(x - y) <= 0.25).mean(axis=(1, 2)))

    v = np.asarray(metrics.pointwise_violations(x, y, np.full_like(x, 0.25)))
    assert np.array_equal(v, (np.abs(x - y) > 0.25).sum(axis=(1, 2)))

    assert np.all(np.asarray(metrics.psnr(x, y)) > 20)
    assert np.all(np.asarray(metrics.psnr(x, x)) > 100)
