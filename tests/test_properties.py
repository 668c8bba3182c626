"""Hypothesis property tests for the engine's algebraic foundations
(SURVEY §5.2): envelope semilattice laws, VL monotonicity under merge, SAX
affine invariance, tier-cascade consistency, gap-fill idempotence."""

import numpy as np
from hypothesis import example, given, settings
from hypothesis import strategies as st

from kapra_timeseries_anonymization_spark.functions.kernels import (
    envelope,
    sax_block,
)

finite = st.floats(
    allow_nan=False, allow_infinity=False, min_value=-1e9, max_value=1e9
)


def series_matrix(draw_rows, t=8):
    return st.lists(
        st.lists(finite, min_size=t, max_size=t),
        min_size=draw_rows[0],
        max_size=draw_rows[1],
    ).map(lambda rows: np.array(rows, dtype=np.float64))


@given(a=series_matrix((1, 12)), b=series_matrix((1, 12)))
@settings(max_examples=150, deadline=None)
def test_envelope_merge_is_exact(a, b):
    """env(A ∪ B) == elementwise-merge(env(A), env(B)) — the semilattice
    fact every distributed phase (partial agg, driver merge, tier rollup)
    relies on."""
    lo_a, hi_a, _ = envelope(a)
    lo_b, hi_b, _ = envelope(b)
    lo_u, hi_u, _ = envelope(np.vstack([a, b]))
    assert np.array_equal(lo_u, np.minimum(lo_a, lo_b))
    assert np.array_equal(hi_u, np.maximum(hi_a, hi_b))


@given(a=series_matrix((1, 12)), b=series_matrix((1, 12)))
@settings(max_examples=150, deadline=None)
def test_vl_monotone_under_merge(a, b):
    """Merging groups can only widen the envelope -> VL never decreases
    (the greedy phase-3 argmin depends on this)."""
    _, _, vl_a = envelope(a)
    _, _, vl_ab = envelope(np.vstack([a, b]))
    assert vl_ab >= vl_a - 1e-12


@given(
    rows=series_matrix((1, 8)),
    scale=st.floats(min_value=0.01, max_value=1000),
    shift=st.floats(min_value=-1e6, max_value=1e6),
)
@settings(max_examples=150, deadline=None)
@example(  # hypothesis-discovered breakpoint-boundary case (r03)
    rows=np.array([[0.0] * 8, [0.0] * 8,
                   [0.0, 0.5, 0.99999, -2.22044605e-16,
                    0.0, 0.0, 0.5, 1e-05]]),
    scale=0.5,
    shift=0.125,
)
def test_sax_affine_invariance(rows, scale, shift):
    """SAX words are invariant under positive-affine transforms of a
    series (z-normalization guarantee) — EXCEPT where the reference's own
    absolute flat-series threshold breaks it: sigma < 1e-6 maps to the
    all-middle word (sax_utils.py:11-12), so scaling a tiny-spread series
    across that threshold legitimately changes the word. The property
    therefore skips the threshold-crossing zone (both sigmas must be
    comfortably above 1e-6), the catastrophic-cancellation zone
    (|shift| >> spread), and the breakpoint-boundary zone: a z-normed PAA
    value landing within rounding distance of a SAX breakpoint can flip
    symbol under ANY fp-exact-equivalent rewrite (hypothesis found a row
    whose first PAA is exactly 0.0 pre-transform and 1.7e-16 post —
    'd' vs 'e' at the level-8 breakpoint 0; measure-zero in real
    arithmetic, inherent to the reference's formula)."""
    from kapra_timeseries_anonymization_spark.functions.kernels import (
        SAX_BREAKPOINTS,
    )

    bps = np.asarray(SAX_BREAKPOINTS[8], dtype=np.float64)
    base = sax_block(rows, 8, 4)
    transformed = sax_block(rows * scale + shift, 8, 4)
    for r, w1, w2 in zip(rows, base, transformed):
        std = float(np.std(r))
        if std < 1e-4 or std * scale < 1e-4:
            continue  # reference's sigma<1e-6 flat-series regime nearby
        if abs(shift) > 1e5 * std / max(scale, 1e-9):
            continue  # float cancellation zone
        paa = ((r - r.mean()) / std).reshape(4, -1).mean(axis=1)
        if np.abs(paa[:, None] - bps[None, :]).min() < 1e-9:
            continue  # breakpoint-boundary zone: symbol flip is fp noise
        assert w1 == w2


def test_cascade_consistency_spark(spark):
    """1h-from-1m == 1h-from-raw for n/sum/min/max (algebraic exactness on
    real data, complementing the DuckDB oracle check)."""
    from kapra_timeseries_anonymization_spark.operators.rollup import (
        rollup_raw,
        rollup_tier,
    )

    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    m1 = rollup_raw(ev, ["event_type"], "ts", "value", 60)
    h_from_m = rollup_tier(m1, ["event_type"], 3600)
    h_direct = rollup_raw(ev, ["event_type"], "ts", "value", 3600)
    a = sorted(map(tuple, h_from_m.collect()))
    b = sorted(map(tuple, h_direct.collect()))
    assert len(a) == len(b)
    for ra, rb in zip(a, b):
        assert ra[0] == rb[0] and ra[1] == rb[1] and ra[2] == rb[2]
        assert abs(ra[3] - rb[3]) < 1e-9  # sum (float assoc tolerance)
        assert ra[4] == rb[4] and ra[5] == rb[5]  # min/max exact


def test_gapfill_idempotent(spark):
    """gap_fill of an already-dense frame is the identity."""
    from pyspark.sql import functions as F

    from kapra_timeseries_anonymization_spark.operators.derive import gap_fill

    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    hourly = ev.groupBy(
        "event_type", F.date_trunc("hour", "ts").alias("bucket")
    ).agg(F.count(F.lit(1)).alias("n"))
    once = gap_fill(hourly, ["event_type"], "bucket", 3600, fill_zero=["n"])
    twice = gap_fill(once, ["event_type"], "bucket", 3600, fill_zero=["n"])
    a = sorted(map(tuple, once.collect()))
    b = sorted(map(tuple, twice.collect()))
    assert a == b
