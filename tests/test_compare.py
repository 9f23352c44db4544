"""Cross-compressor acceptance (reference data/compare.py:12-33 analogue).

The reference's headline table shows EBCC beating SZ/SZ3/SPERR at equal
absolute bound (data/logs.txt:1-5).  This pins the same property against
the locally reproducible baselines: EBCC-TPU must compress smaller than a
uniform-quantisation+zstd codec and a 2-D Lorenzo-predictor+zstd codec
(the SZ core) at the same bound, and every method must satisfy the bound.
"""

import importlib.util
import os
import sys

import numpy as np
import pytest

_spec = importlib.util.spec_from_file_location(
    "compare_codecs",
    os.path.join(os.path.dirname(__file__), "..", "scripts",
                 "compare_codecs.py"))
compare_codecs = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(compare_codecs)


@pytest.mark.slow
def test_beats_error_bounded_baselines(small_frame):
    error = 0.1
    rows, verdict = compare_codecs.run(small_frame, error)
    by = {r["method"]: r for r in rows}
    # bound satisfaction for every error-bounded method
    for m in ("ebcc_tpu", "quant-zstd", "lorenzo-zstd"):
        assert by[m]["max_error"] <= error + 1e-6, m
    # the headline acceptance: EBCC smaller than both baselines
    assert verdict == "PASS"
    assert by["ebcc_tpu"]["bytes"] < by["quant-zstd"]["bytes"]
    assert by["ebcc_tpu"]["bytes"] < by["lorenzo-zstd"]["bytes"]
    # and hugely smaller than lossless
    assert by["ebcc_tpu"]["bytes"] * 4 < by["zstd(lossless)"]["bytes"]
