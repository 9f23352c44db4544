"""Distributed DWT (spatial tiling + halo exchange) correctness.

The sharded transform must be bit-identical to the single-device transform
up to the documented per-shard row permutation, and perfectly invertible.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ebcc_tpu.ops import dwt, dwt_sharded

LEVELS = 3
H, W = 128, 64


@pytest.fixture(scope="module")
def mesh4():
    devs = jax.devices()
    if len(devs) < 4:
        pytest.skip("needs 4 devices")
    return Mesh(np.asarray(devs[:4]), axis_names=("space",))


@pytest.fixture(scope="module")
def data():
    rng = np.random.default_rng(5)
    return rng.normal(0, 1, (2, H, W)).astype(np.float32)


def test_matches_single_device_up_to_layout(mesh4, data):
    """The distributed transform equals the single-device transform under
    the documented layout conversion (halos deliver true neighbour
    values, so the numerics agree to float addition-order tolerance)."""
    fwd, _ = dwt_sharded.make_sharded_dwt2d(mesh4, LEVELS)
    x = jax.device_put(data, NamedSharding(mesh4, P(None, "space", None)))
    out = dwt_sharded.to_canonical(np.asarray(fwd(x)), 4, LEVELS)
    ref = np.asarray(dwt.dwt2d_multi(jnp.asarray(data), LEVELS))
    np.testing.assert_allclose(out, ref, rtol=0, atol=1e-4)


def test_perfect_reconstruction(mesh4, data):
    fwd, inv = dwt_sharded.make_sharded_dwt2d(mesh4, LEVELS)
    x = jax.device_put(data, NamedSharding(mesh4, P(None, "space", None)))
    rec = np.asarray(inv(fwd(x)))
    np.testing.assert_allclose(rec, data, atol=1e-4)


def test_single_shard_degenerates_to_local():
    mesh1 = Mesh(np.asarray(jax.devices()[:1]), axis_names=("space",))
    rng = np.random.default_rng(1)
    d = rng.normal(0, 1, (1, H, W)).astype(np.float32)
    fwd, _ = dwt_sharded.make_sharded_dwt2d(mesh1, LEVELS)
    out = np.asarray(fwd(jnp.asarray(d)))
    ref = np.asarray(dwt.dwt2d_multi(jnp.asarray(d), LEVELS))
    assert np.array_equal(out, ref)


def test_composes_with_data_parallel_mesh(data):
    """Halo-exchange DWT on a 2-D (data x space) mesh: batch sharded over
    ``data``, rows over ``space`` — the composition the multi-chip codec
    uses (frames across chips, spatial tiling within)."""
    devs = jax.devices()
    if len(devs) < 8:
        pytest.skip("needs 8 devices")
    mesh = Mesh(np.asarray(devs[:8]).reshape(2, 4),
                axis_names=("data", "space"))
    spec = P("data", "space", None)

    fwd = jax.jit(
        jax.shard_map(
            lambda v: dwt_sharded.dwt2d_multi_sharded(v, LEVELS, "space"),
            mesh=mesh, in_specs=spec, out_specs=spec))
    x = jax.device_put(data, NamedSharding(mesh, spec))
    out = dwt_sharded.to_canonical(np.asarray(fwd(x)), 4, LEVELS)
    ref = np.asarray(dwt.dwt2d_multi(jnp.asarray(data), LEVELS))
    np.testing.assert_allclose(out, ref, rtol=0, atol=1e-4)


def test_to_canonical_roundtrips_shapes():
    g = np.arange(4 * H * W, dtype=np.float32).reshape(4, H, W)[0:1]
    c = dwt_sharded.to_canonical(g, 4, LEVELS)
    # layout conversion is a permutation: same multiset of values
    assert np.array_equal(np.sort(c.ravel()), np.sort(g.ravel()))
