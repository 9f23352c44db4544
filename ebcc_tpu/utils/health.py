"""Device-backend health probe and compile-cache setup, shared by the
API's auto-routing (api._device_alive), bench.py and the driver entry
points.  Importable without initialising any JAX backend (tunnel-attached
backends HANG on init during outages — the probe always runs in a
subprocess with a timeout)."""

from __future__ import annotations

import os
import tempfile
import time

PROBE_TTL_S = 300
PROBE_TIMEOUT_S = 150


def _cache_path() -> str:
    uid = getattr(os, "getuid", lambda: 0)()
    return os.path.join(tempfile.gettempdir(), f"ebcc_device_probe_{uid}")


def read_cached_verdict() -> bool | None:
    """Fresh cached probe verdict, or None when absent/stale."""
    path = _cache_path()
    try:
        st = os.stat(path)
        # the cache lives in world-writable /tmp under a predictable name:
        # never trust a file another user planted there (a forged "dead"
        # would reroute every encode; a forged "alive" would let a wedged
        # tunnel hang backend init)
        if st.st_uid != getattr(os, "getuid", lambda: st.st_uid)():
            return None
        if time.time() - st.st_mtime < PROBE_TTL_S:
            with open(path) as f:
                v = f.read().strip()
            if v in ("alive", "dead"):
                return v == "alive"
    except OSError:
        pass
    return None


def write_verdict(alive: bool) -> None:
    """Atomically record a probe verdict (concurrent readers never see a
    truncated file)."""
    path = _cache_path()
    try:
        fd, tmp = tempfile.mkstemp(dir=os.path.dirname(path))
        with os.fdopen(fd, "w") as f:
            f.write("alive" if alive else "dead")
        os.replace(tmp, path)
    except OSError:
        pass


def probe_backend(use_cache: bool = True,
                  timeout_s: float | None = None) -> bool:
    """Whether the default JAX backend can initialise, via a subprocess
    (a wedged tunnel hangs backend init — it must not hang the caller).
    ``timeout_s`` overrides PROBE_TIMEOUT_S for budget-boxed callers; a
    wedged probe that hits the shorter box reads as dead (correct: a
    healthy tunnel answers in well under a minute)."""
    if use_cache:
        cached = read_cached_verdict()
        if cached is not None:
            return cached
    import subprocess
    import sys
    code = ("import jax, jax.numpy as jnp;"
            "print(float(jnp.sum(jnp.ones((4,4)))))")
    try:
        alive = subprocess.run([sys.executable, "-c", code],
                               timeout=timeout_s or PROBE_TIMEOUT_S,
                               capture_output=True).returncode == 0
    except Exception:
        alive = False
    write_verdict(alive)
    return alive


def enable_compile_cache() -> None:
    """Persistent JAX compilation cache (keyed by HLO; results unaffected).
    Shared by bench.py, scan_cratio.py, dryrun_multichip and conftest."""
    import jax
    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    except Exception:
        pass
