"""Property tests for the round-3 kernels.

- PPM roundtrip: make→parse is the identity over the whole fixture
  id space (hypothesis-driven), and parsing is total (never raises) on
  arbitrary byte prefixes of valid files.
- Column-wise numpy left fold == Python scalar left fold, bit-exact,
  for arbitrary float inputs — the identity the arrow kernels rest on.
- End-to-end fold-kernel mode: the pure-Catalyst path still matches
  the DuckDB oracle (guards the fallback path against rot).
"""

from __future__ import annotations

import math

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from strategy_analyzer_exporter_spark.functions import vector
from strategy_analyzer_exporter_spark.operators.multimodal import make_ppm, parse_ppm


@given(st.integers(min_value=0, max_value=10**12))
@settings(max_examples=200, deadline=None)
def test_ppm_roundtrip_property(doc_id):
    w, h, raster = parse_ppm(make_ppm(doc_id))
    assert (w, h) == (4 + doc_id % 5, 3 + doc_id % 4)
    assert len(raster) == w * h * 3


@given(st.integers(min_value=0, max_value=10**6), st.integers(min_value=0, max_value=200))
@settings(max_examples=100, deadline=None)
def test_ppm_parse_total_on_truncation(doc_id, cut):
    b = make_ppm(doc_id)
    out = parse_ppm(b[: min(cut, len(b))])
    assert out is None or out == parse_ppm(b)


@given(
    st.lists(
        st.floats(
            min_value=-1e300, max_value=1e300, allow_nan=False, allow_infinity=False
        ),
        min_size=1,
        max_size=64,
    )
)
@settings(max_examples=200, deadline=None)
def test_fold_sum_matches_scalar_left_fold(xs):
    arr = np.asarray([xs], dtype=np.float64)
    got = vector.fold_sum(arr)[0]
    acc = 0.0
    for x in xs:
        acc = acc + x
    assert got == acc or (math.isnan(got) and math.isnan(acc))


def test_fold_kernel_mode_end_to_end(spark, monkeypatch):
    from oracle_harness import compare

    import __spark_entry__ as E

    monkeypatch.setenv(vector.KERNEL_ENV, "fold")
    qs, osql = E.queries(), E.oracle_sql()
    for name in ("similarity_bruteforce_topk", "kmeans_embeddings"):
        r = compare(
            qs[name](spark, "/root/testdata/sf0.001"),
            osql[name],
            sf_dir="/root/testdata/sf0.001",
        )
        assert r["ok"], f"{name} (fold kernel): {r['detail']}"
