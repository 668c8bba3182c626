"""Range-query error of anonymized envelopes — the reference's published
utility metric.

Reference claim (/root/reference/docs/naive-algo.md:91, SURVEY §6): the
naive pipeline's best-trade-off config (K=5, P=2, MaxLevel=10) keeps
"Range Query Error < 10%" on the 3,000-record synthetic dataset. The
reference publishes no measurement procedure, so this module uses the
standard estimator from the (k,P)-anonymity time-series literature
(Shou et al., "Supporting Pattern-Preserving Anonymization for
Time-Series Data", TKDE'13 — the paper the reference implements): for a
count range query "how many series have value in [a, b] at time t", the
anonymized table answers with the uniform-within-envelope estimate —
each record whose envelope at t is [L, U] contributes
``overlap([a,b],[L,U]) / (U - L)`` (a point envelope contributes 1 iff
L is inside the query range) — and the error of one query is
``|estimate - true_count| / true_count``.

Predicates are random-but-deterministic: every draw is an md5-derived
uniform, so Spark, numpy (tests/test_range_error.py) and the DuckDB
oracle (the `range_query_truth` registry entry) replay the exact same
query workload bit-for-bit; no RNG state exists anywhere.

Scale shape: predicates are O(n_queries) driver rows broadcast against
the record table; the cross join never materializes (scan -> broadcast
nested loop -> hash aggregate with map-side partials over n_queries
keys), so the cost at 100 TB is one pass over the records regardless of
the number of probes.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: denominator of the md5-derived uniforms: 12 hex chars = 48 bits
_U48 = float(1 << 48)


def _u(tag: str, qid: int, salt: str) -> float:
    """Deterministic uniform in [0, 1): first 48 bits of md5."""
    h = int(hashlib.md5(f"{tag}:{qid}:{salt}".encode()).hexdigest()[:12], 16)
    return h / _U48


def range_predicates(
    n_queries: int, t: int, vmin: float, vmax: float, tag: str = "rq"
) -> list[tuple[int, int, float, float]]:
    """(qid, t_idx, q_lo, q_hi) per query: a time position and a value
    interval covering 5-50% of the observed domain, placed uniformly.
    Pure function of (tag, qid, t, vmin, vmax) — the DuckDB oracle
    repeats this arithmetic verbatim, so expression ORDER matters: keep
    it in sync with the `range_query_truth` SQL in queries.py."""
    dom = vmax - vmin
    out = []
    for qid in range(n_queries):
        t_idx = int(_u(tag, qid, "t") * t) % t
        w = (0.05 + 0.45 * _u(tag, qid, "w")) * dom
        lo = vmin + _u(tag, qid, "a") * (dom - w)
        out.append((qid, t_idx, lo, lo + w))
    return out


def _domain(series: DataFrame, values_col: str) -> tuple[float, float]:
    row = series.agg(
        F.min(F.array_min(values_col)).alias("lo"),
        F.max(F.array_max(values_col)).alias("hi"),
    ).first()
    return float(row["lo"]), float(row["hi"])


def range_query_truth(
    series: DataFrame,
    t: int,
    n_queries: int = 50,
    values_col: str = "values",
    tag: str = "rq",
) -> DataFrame:
    """Ground-truth counts per predicate over the RAW series:
    (qid, t_idx, q_lo, q_hi, true_cnt). Fully SQL-expressible — the
    registry pairs it with a DuckDB oracle that regenerates the same
    predicates, machine-checking the predicate arithmetic."""
    spark = series.sparkSession
    vmin, vmax = _domain(series, values_col)
    pdf = spark.createDataFrame(
        range_predicates(n_queries, t, vmin, vmax, tag),
        "qid int, t_idx int, q_lo double, q_hi double",
    )
    v = F.element_at(values_col, F.col("t_idx") + 1)
    hit = F.when((v >= F.col("q_lo")) & (v <= F.col("q_hi")), 1).otherwise(0)
    return (
        series.crossJoin(F.broadcast(pdf))
        .groupBy("qid", "t_idx", "q_lo", "q_hi")
        .agg(F.sum(hit).cast("long").alias("true_cnt"))
        .select(
            "qid", "t_idx",
            F.round("q_lo", 6).alias("q_lo"),
            F.round("q_hi", 6).alias("q_hi"),
            "true_cnt",
        )
    )


def range_query_error(
    records: DataFrame,
    series: DataFrame,
    t: int,
    n_queries: int = 50,
    values_col: str = "values",
    tag: str = "rq",
) -> DataFrame:
    """Per-predicate range-query accuracy of an anonymized output:
    (qid, t_idx, q_lo, q_hi, true_cnt, est_cnt, rel_err).

    ``records`` must carry (original_index, lower, upper) — the output
    of either (k,P) pipeline; ``series`` the raw (original_index,
    values). ``rel_err`` is NULL where true_cnt = 0 (relative error is
    undefined there; callers average over the non-null rows).

    Truth semantics (r05, ADVICE r04 medium): ``true_cnt`` counts over
    the FULL raw series — including series the pipeline suppressed
    (KAPRA drops sub-P residue) — because the metric models a consumer
    asking the raw table vs the anonymized table. Suppressed series
    therefore count toward the truth and contribute 0 to the estimate
    (series LEFT JOIN records; a missing envelope estimates 0), which
    makes this truth identical to :func:`range_query_truth` on the same
    predicates and removes the downward bias the old INNER join gave
    rel_err when n_suppressed > 0."""
    spark = series.sparkSession
    vmin, vmax = _domain(series, values_col)
    pdf = spark.createDataFrame(
        range_predicates(n_queries, t, vmin, vmax, tag),
        "qid int, t_idx int, q_lo double, q_hi double",
    )
    joined = (
        series.select("original_index", F.col(values_col).alias("_v"))
        .join(
            records.select("original_index", "lower", "upper"),
            "original_index",
            "left",
        )
        .crossJoin(F.broadcast(pdf))
    )
    v = F.element_at("_v", F.col("t_idx") + 1)
    lo = F.element_at("lower", F.col("t_idx") + 1)
    up = F.element_at("upper", F.col("t_idx") + 1)
    width = up - lo
    overlap = F.greatest(
        F.lit(0.0),
        F.least(up, F.col("q_hi")) - F.greatest(lo, F.col("q_lo")),
    )
    est = F.when(F.col("lower").isNull(), 0.0).otherwise(
        F.when(width > 0, overlap / width).otherwise(
            F.when((lo >= F.col("q_lo")) & (lo <= F.col("q_hi")), 1.0).otherwise(0.0)
        )
    )
    hit = F.when((v >= F.col("q_lo")) & (v <= F.col("q_hi")), 1).otherwise(0)
    agg = joined.groupBy("qid", "t_idx", "q_lo", "q_hi").agg(
        F.sum(hit).cast("long").alias("true_cnt"),
        F.sum(est).alias("_est"),
    )
    return agg.select(
        "qid", "t_idx",
        F.round("q_lo", 6).alias("q_lo"),
        F.round("q_hi", 6).alias("q_hi"),
        "true_cnt",
        F.round("_est", 4).alias("est_cnt"),
        F.when(
            F.col("true_cnt") > 0,
            F.round(
                F.abs(F.col("_est") - F.col("true_cnt")) / F.col("true_cnt"), 6
            ),
        ).alias("rel_err"),
    )
