"""Test configuration: run JAX on a virtual 8-device CPU mesh.

Must set env vars before the first ``import jax`` anywhere in the test
process, so this sits at the top of conftest.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    flags += " --xla_force_host_platform_device_count=8"
if "collective_call_terminate_timeout" not in flags:
    # 8 virtual devices time-slice one core: a replica can take longer
    # than the default 20 s/40 s collective-rendezvous timeouts to reach
    # its ppermute, which ABORTS the process (flaky under load)
    flags += (" --xla_cpu_collective_call_warn_stuck_timeout_seconds=300"
              " --xla_cpu_collective_call_terminate_timeout_seconds=1200")
os.environ["XLA_FLAGS"] = flags.strip()

import jax

# The axon TPU plugin's sitecustomize forces jax_platforms="axon,cpu" at
# interpreter start, overriding the env var; undo that for tests.
if "axon" in (jax.config.jax_platforms or ""):
    jax.config.update("jax_platforms", "cpu")

# persistent compilation cache: the full pipeline compiles in 40-90 s per
# geometry on this 1-core host; cached executables cut suite re-runs by
# many minutes.  Purely a dev-velocity knob — traced programs are keyed
# by their HLO, so results are unaffected.
try:
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
except Exception:
    pass

import numpy as np
import pytest


@pytest.fixture(scope="session")
def era5_frame():
    """The reference's canonical test fixture: 721x1440 f32 temperature."""
    path = "/root/reference/data/test_data.npy"
    if os.path.exists(path):
        return np.load(path).astype(np.float32)
    rng = np.random.default_rng(0)
    # synthetic smooth field with the same shape/scale as ERA5 temperature
    y, x = np.mgrid[0:721, 0:1440]
    base = 260 + 25 * np.sin(y / 721 * np.pi) * np.cos(x / 1440 * 2 * np.pi)
    return (base + rng.normal(0, 0.5, base.shape)).astype(np.float32)


@pytest.fixture(scope="session")
def small_frame(era5_frame):
    """Small crop for fast unit tests."""
    return np.ascontiguousarray(era5_frame[:96, :160])
