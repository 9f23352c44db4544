"""Worker process for the two-process jax.distributed test.

Usage: python distributed_worker.py <process_id> <num_processes> <port>

Each process owns 2 virtual CPU devices; together they form a 2x2
(data x space) mesh spanning a process (DCN-analogue) boundary.  The
worker validates the codec's cross-host collective patterns: sharded
per-frame min/max reductions (the stack-wide statistics pattern) and a
psum over both mesh axes inside shard_map (the error-stat reduction
pattern), then prints OK.
"""

import os
import sys

pid, nproc, port = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]
# must be set before the first jax import (the axon sitecustomize stomps
# the env, so set config explicitly after import too)
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"

import jax  # noqa: E402

if "axon" in (jax.config.jax_platforms or ""):
    jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from jax.sharding import NamedSharding, PartitionSpec as P  # noqa: E402

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ebcc_tpu.parallel import mesh as pmesh  # noqa: E402

assert pmesh.init_distributed(f"localhost:{port}", num_processes=nproc,
                              process_id=pid)
assert jax.process_count() == nproc, jax.process_count()
assert len(jax.devices()) == 2 * nproc, len(jax.devices())

mesh = pmesh.make_mesh(n_data=2, n_space=2)

gshape = (4, 16, 32)
base = np.arange(np.prod(gshape), dtype=np.float32).reshape(gshape)
sharding = NamedSharding(mesh, P("data", "space", None))
arr = jax.make_array_from_callback(gshape, sharding, lambda idx: base[idx])

# pattern 1: per-frame reductions over a spatially-sharded stack
# (frame min/max statistics; XLA inserts the cross-process collectives)
@jax.jit
def minmax(x):
    return (jax.lax.with_sharding_constraint(
        jnp.min(x, axis=(-2, -1)), NamedSharding(mesh, P())),
        jax.lax.with_sharding_constraint(
            jnp.max(x, axis=(-2, -1)), NamedSharding(mesh, P())))

mn, mx = minmax(arr)
np.testing.assert_array_equal(np.asarray(mn), base.min(axis=(-2, -1)))
np.testing.assert_array_equal(np.asarray(mx), base.max(axis=(-2, -1)))

# pattern 2: psum across BOTH mesh axes inside shard_map (the sharded
# error-statistic reduction), crossing the process boundary
@jax.jit
def total(x):
    def local(v):
        return jax.lax.psum(jnp.sum(v), ("data", "space"))

    return jax.shard_map(local, mesh=mesh,
                         in_specs=P("data", "space", None),
                         out_specs=P())(x)

t = float(np.asarray(total(arr)))
assert t == float(base.sum()), (t, float(base.sum()))

print(f"OK process {pid}/{nproc}: {len(jax.devices())} global devices, "
      f"mesh {dict(zip(mesh.axis_names, mesh.devices.shape))}")
