"""Trainable ML forecaster for predictive compression.

The reference's predictive pipeline runs Microsoft Aurora over previously
*decompressed* states and compresses only ``truth - forecast``
(/root/reference/scripts/delta_compression/run_aurora.py:163-330).  This
module provides the in-repo equivalent: a small flax ConvNet forecaster
plus its training loop, wired into :class:`PredictiveCompressor` through
the same ``forecast_fn(history) -> prediction`` contract.

Determinism contract (run_aurora.py:259-322 semantics): the forecast is a
jitted pure function of (frozen params, history); compress and decompress
feed it the same reconstructed history on the same backend, so encoder and
decoder states stay bit-identical.  The trained parameters must travel
with the data (:func:`save_params` / :func:`load_params`) — they are part
of the codec state, exactly as the Aurora checkpoint is for the reference.
"""

from __future__ import annotations

import io
import pickle
from typing import Sequence

import numpy as np

try:
    import flax.linen as nn
    import jax
    import jax.numpy as jnp
    import optax
    HAVE_FLAX = True
except ImportError:  # pragma: no cover - flax/optax are in the image
    HAVE_FLAX = False


if HAVE_FLAX:
    class ConvForecaster(nn.Module):
        """Tiny residual ConvNet: [K, H, W] history -> next frame.

        Predicts the *increment* over persistence (last frame), so an
        untrained model already matches the persistence baseline and
        training only has to learn the dynamics.
        """

        features: int = 16
        kernel: int = 5

        @nn.compact
        def __call__(self, history):  # [K, H, W]
            x = jnp.moveaxis(history, 0, -1)  # [H, W, K]
            last = history[-1]
            k = (self.kernel, self.kernel)
            x = nn.Conv(self.features, k, padding="SAME")(x)
            x = nn.gelu(x)
            x = nn.Conv(self.features, k, padding="SAME")(x)
            x = nn.gelu(x)
            x = nn.Conv(1, k, padding="SAME")(x)
            return last + x[..., 0]


def train_forecaster(data, warmup: int = 2, *, features: int = 16,
                     steps: int = 300, lr: float = 3e-3, seed: int = 0,
                     normalize: bool = True):
    """Train a :class:`ConvForecaster` on a [T, H, W] sequence.

    Returns ``(params, meta)`` where ``meta`` carries the normalisation
    constants (part of the model state).  Training minimises next-frame
    MSE over all (history window -> next) pairs.
    """
    if not HAVE_FLAX:
        raise RuntimeError("flax/optax unavailable")
    data = np.asarray(data, np.float32)
    t = data.shape[0]
    if t <= warmup:
        raise ValueError("need more than `warmup` frames to train")
    mu = float(data.mean()) if normalize else 0.0
    sd = float(data.std()) or 1.0 if normalize else 1.0
    norm = (data - mu) / sd

    model = ConvForecaster(features=features)
    rng = jax.random.PRNGKey(seed)
    params = model.init(rng, jnp.zeros((warmup, *data.shape[1:])))
    opt = optax.adam(lr)
    opt_state = opt.init(params)

    windows = np.stack([norm[i:i + warmup] for i in range(t - warmup)])
    targets = norm[warmup:]

    @jax.jit
    def step(params, opt_state, hist, tgt):
        def loss_fn(p):
            pred = jax.vmap(lambda h: model.apply(p, h))(hist)
            return jnp.mean((pred - tgt) ** 2)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = opt.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    hist_d = jnp.asarray(windows)
    tgt_d = jnp.asarray(targets)
    loss = None
    for _ in range(steps):
        params, opt_state, loss = step(params, opt_state, hist_d, tgt_d)
    meta = {"warmup": warmup, "features": features, "mu": mu, "sd": sd,
            "final_loss": float(loss)}
    return params, meta


def make_forecast_fn(params, meta):
    """Deterministic ``forecast_fn`` for :class:`PredictiveCompressor`."""
    if not HAVE_FLAX:
        raise RuntimeError("flax/optax unavailable")
    model = ConvForecaster(features=meta["features"])
    mu, sd = meta["mu"], meta["sd"]

    @jax.jit
    def apply(hist):
        return model.apply(params, (hist - mu) / sd) * sd + mu

    def forecast_fn(history: Sequence[np.ndarray]) -> np.ndarray:
        hist = jnp.asarray(np.stack(list(history)[-meta["warmup"]:],
                                    axis=0), jnp.float32)
        return np.asarray(apply(hist), np.float32)

    return forecast_fn


def save_params(params, meta) -> bytes:
    """Serialise (params, meta) — the codec-state analogue of the Aurora
    checkpoint the reference pipeline depends on."""
    from flax.serialization import to_bytes
    buf = io.BytesIO()
    pickle.dump({"meta": meta, "params": to_bytes(params)}, buf)
    return buf.getvalue()


def load_params(blob: bytes, template_shape):
    """Inverse of :func:`save_params`; ``template_shape`` = (H, W).

    Uses pickle: load only checkpoints you produced (the same trust model
    as torch.load for the reference's Aurora checkpoint)."""
    from flax.serialization import from_bytes
    d = pickle.loads(blob)
    meta = d["meta"]
    model = ConvForecaster(features=meta["features"])
    template = model.init(
        jax.random.PRNGKey(0),
        jnp.zeros((meta["warmup"], *template_shape), jnp.float32))
    params = from_bytes(template, d["params"])
    return params, meta
