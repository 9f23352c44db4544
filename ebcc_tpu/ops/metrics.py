"""Error metrics: data range, max error, relative error, quantiles.

Parity with the reference's metric helpers (/root/reference/src/
j2k_codec.h:237-303: ``get_data_range``, ``get_max_error``,
``get_max_relative_error``, ``get_error_target_quantile`` and the pointwise
variants), batched over a leading frame axis and jit-friendly.
"""

from __future__ import annotations

import jax.numpy as jnp


def data_range(x):
    """max - min per frame (j2k_codec.h:237-249)."""
    return jnp.max(x, axis=(-2, -1)) - jnp.min(x, axis=(-2, -1))


def max_error(x, y):
    """max |x - y| per frame (j2k_codec.h:264-279)."""
    return jnp.max(jnp.abs(x - y), axis=(-2, -1))


def max_relative_error(x, y):
    """max |x - y| / range(x) per frame (j2k_codec.h:251-262)."""
    return max_error(x, y) / data_range(x)


def error_quantile(x, y, error_target):
    """Fraction of points with |x - y| <= target (j2k_codec.h:281-291).

    ``error_target`` broadcasts: scalar, per-frame [B], or per-point.
    """
    t = jnp.asarray(error_target)
    if t.ndim == 1:
        t = t[:, None, None]
    return jnp.mean(jnp.abs(x - y) <= t, axis=(-2, -1))


def pointwise_violations(x, y, error_bound):
    """Count of points violating a per-point bound (j2k_codec.h:293-303)."""
    return jnp.sum(jnp.abs(x - y) > error_bound, axis=(-2, -1))


def rmse(x, y):
    return jnp.sqrt(jnp.mean((x - y) ** 2, axis=(-2, -1)))


def psnr(x, y):
    """Peak signal-to-noise ratio against the per-frame data range."""
    r = data_range(x)
    return 20.0 * jnp.log10(r / jnp.maximum(rmse(x, y), 1e-30))
