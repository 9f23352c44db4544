"""Tracing / profiling helpers.

The reference instruments with ad-hoc ``time.time()`` spans and MB/s prints
(/root/reference/ebcc_wrapper/delta_compression.py:385-387,
scripts/scan_cratio/scan_cratio_single_level.py:39-47).  The TPU equivalents
are (a) wall-clock spans that ``block_until_ready`` their device values so
async dispatch doesn't hide the cost, and (b) optional ``jax.profiler`` trace
annotations that show up in TensorBoard/perfetto traces.
"""

from __future__ import annotations

import contextlib
import time

import jax

from . import logging as elog


class Timer:
    """Accumulating named wall-clock spans with throughput reporting."""

    def __init__(self):
        self.spans: dict[str, float] = {}
        self.counts: dict[str, int] = {}

    @contextlib.contextmanager
    def span(self, name: str, nbytes: int | None = None):
        with jax.profiler.TraceAnnotation(name):
            t0 = time.perf_counter()
            yield
            dt = time.perf_counter() - t0
        self.spans[name] = self.spans.get(name, 0.0) + dt
        self.counts[name] = self.counts.get(name, 0) + 1
        if nbytes is not None:
            elog.debug("%s: %.3fs (%.1f MB/s)", name, dt,
                       nbytes / dt / 1e6)

    def report(self) -> dict:
        return {k: {"total_s": v, "calls": self.counts[k]}
                for k, v in self.spans.items()}


@contextlib.contextmanager
def device_span(name: str, *values):
    """Span that waits for ``values`` (device arrays) before stopping the
    clock — the correct way to time jitted work (async dispatch otherwise
    returns immediately)."""
    with jax.profiler.TraceAnnotation(name):
        t0 = time.perf_counter()
        yield
        for v in values:
            jax.block_until_ready(v)
        elog.debug("%s: %.3fs", name, time.perf_counter() - t0)


@contextlib.contextmanager
def trace_to(logdir: str):
    """Capture a jax.profiler trace of the enclosed block (TensorBoard/
    perfetto viewable) — the profiler-integration upgrade over the
    reference's prints."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
