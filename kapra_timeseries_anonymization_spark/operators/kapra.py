"""KAPRA bottom-up (k,P)-anonymization as a distributed Spark pipeline.

Semantics: exact match to the reference pipeline
(/root/reference/src/kapra_anonymization.py:46-333):

- Phase 1: SAX at max level, hash-group, split good (>= P) / bad.
- Phase 2: recycle bad records at decreasing levels (floor 3); leftover
  residue becomes one '*' group if >= P, else is suppressed.
- Phase 3: greedy min-VL merge of P-groups until all >= K, with the
  reference's exact ordering semantics (stable sort by size, first-min
  argmin, domination ties -> partner, pop/append list order).

Spark-first architecture (SURVEY §7):

- SAX at *all* levels is computed in ONE vectorized pandas-UDF pass
  (z-norm + PAA once per record), instead of the reference's per-level
  recompute — the recycle loop then never touches Python again.
- The recycle loop is a bounded driver loop (<= sax_level-2 passes) over a
  shrinking DataFrame; each pass is one window aggregation keyed by the
  precomputed SAX word. Only counts decide; no data is collected.
- Phase 3 collects ONLY compact per-P-group envelope summaries
  (count, lower[T], upper[T]) — O(G*T) driver memory, G = #patterns << N.
  This is exact because merge cost = VL of the combined group, VL depends
  only on the envelope, and envelopes merge by elementwise min/max
  (min/max semilattice). The greedy loop runs vectorized numpy argmin per
  round; the resulting p-group -> k-group map is broadcast-joined back.
- Record order parity: the reference's dict-insertion / list-concatenation
  ordering is tracked with an `okey` column (array<long>, lexicographic),
  prepended with the group-min key at each recycle pass — so even the
  exact output row order is reproducible without ever sorting raw data on
  the driver.

Scale: the only driver-side state is G envelope summaries; everything else
is shuffles keyed by SAX word (bounded cardinality <= level^n_segments) and
one broadcast map-back join. At 100 TB the heavy stages are the initial UDF
scan (embarrassingly parallel) and one window/groupBy per recycle pass over
a geometrically shrinking bad set.
"""

from __future__ import annotations

import math
from dataclasses import dataclass

import numpy as np
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.sax_udfs import make_sax_levels_udf, pattern_loss_udf
from .envelope import envelope_agg


@dataclass
class KapraGroups:
    """Result of the KAPRA pipeline.

    ``records``: one row per surviving input record with columns
      (<index_col>, group_id, pattern, level, pl, lower, upper, vl,
       p_order, okey) — order by (group_id, p_order, okey) to reproduce the
      reference's exact output row order.
    ``groups``: driver-side list in GroupID order:
      dicts with sax, level, count, lower, upper, vl.
    """

    records: DataFrame
    groups: list[dict]
    avg_vl: float
    avg_pl: float
    n_suppressed: int


def _pgid(level_col, sax_col):
    return F.concat_ws(":", level_col.cast("string"), sax_col)


def kapra_anonymize(
    df: DataFrame,
    values_col: str = "values",
    index_col: str = "original_index",
    K: int = 8,
    P: int = 2,
    sax_level: int = 8,
    n_segments: int = 4,
    t: int | None = None,
    compute_pl: bool = True,
) -> KapraGroups:
    spark = df.sparkSession
    if t is None:
        t = len(df.select(values_col).first()[0])

    levels = list(range(3, sax_level + 1))
    sax_udf = make_sax_levels_udf(levels, n_segments)

    base = (
        df.select(
            F.col(index_col).cast("long").alias("original_index"),
            F.col(values_col).alias("values"),
        )
        .withColumn("sax_arr", sax_udf(F.col("values")))
        .withColumn("okey", F.array(F.col("original_index")))
    )

    # ---- Phases 1+2: bounded recycle loop (driver controls, data stays out)
    assigned: list[DataFrame] = []
    remaining = base.persist()
    n_remaining = remaining.count()
    pass_idx = 0
    to_unpersist = [remaining]
    for level in range(sax_level, 2, -1):
        if n_remaining == 0:
            break
        w = Window.partitionBy("sax")
        cur = (
            remaining.withColumn("sax", F.col("sax_arr").getItem(level - 3))
            .withColumn("_cnt", F.count(F.lit(1)).over(w))
            .withColumn("_gkey", F.min("okey").over(w))
        )
        good = cur.filter(F.col("_cnt") >= P).select(
            "original_index",
            "values",
            "okey",
            "sax",
            F.lit(level).alias("level"),
            F.lit(pass_idx).alias("pass_idx"),
            F.col("_gkey").alias("gkey"),
            F.col("sax").alias("p_sax"),
            F.lit(level).alias("p_level"),
        )
        assigned.append(good)
        remaining = (
            cur.filter(F.col("_cnt") < P)
            .withColumn("okey", F.concat(F.col("_gkey"), F.col("okey")))
            .select("original_index", "values", "sax_arr", "okey",
                    F.col("sax").alias("last_sax"))
            .persist()
        )
        n_remaining = remaining.count()
        to_unpersist.append(remaining)
        pass_idx += 1

    n_suppressed = 0
    if n_remaining > 0:
        if n_remaining >= P:
            # '*' residue group (symbolic level 0); records keep their
            # last-pass sax/level metadata (= level of the final pass run).
            last_level = max(3, sax_level - pass_idx)
            residue = remaining.select(
                "original_index",
                "values",
                "okey",
                F.col("last_sax").alias("sax"),
                F.lit(last_level).alias("level"),
                F.lit(10**6).alias("pass_idx"),
                F.array(F.lit(-1).cast("long")).alias("gkey"),
                F.lit("*").alias("p_sax"),
                F.lit(0).alias("p_level"),
            )
            assigned.append(residue)
        else:
            n_suppressed = n_remaining

    if not assigned:
        raise ValueError("no records survived P-grouping")

    tagged = assigned[0]
    for part in assigned[1:]:
        tagged = tagged.unionByName(part)
    tagged = tagged.withColumn("p_gid", _pgid(F.col("p_level"), F.col("p_sax")))
    tagged = tagged.persist()

    # ---- P-group envelope summaries (exact, tiny): collect to driver
    summaries = (
        envelope_agg(tagged, ["p_gid", "p_sax", "p_level", "pass_idx"],
                     "values", t, with_vl=False)
        .join(
            tagged.groupBy("p_gid").agg(F.min("gkey").alias("gkey")), "p_gid"
        )
        .collect()
    )
    summaries.sort(key=lambda r: (r["pass_idx"], tuple(r["gkey"])))

    # ---- Phase 3: reference-exact greedy merge on summaries (driver)
    groups = [
        {
            "sax": r["p_sax"],
            "level": int(r["p_level"]),
            "count": int(r["count"]),
            "lo": np.asarray(r["lower"], dtype=np.float64),
            "hi": np.asarray(r["upper"], dtype=np.float64),
            "members": [r["p_gid"]],
        }
        for r in summaries
    ]
    while True:
        invalid = [i for i, g in enumerate(groups) if g["count"] < K]
        if not invalid:
            break
        invalid.sort(key=lambda i: groups[i]["count"])  # stable, like ref
        idx = invalid[0]
        g = groups[idx]
        los = np.stack([x["lo"] for x in groups])
        his = np.stack([x["hi"] for x in groups])
        mlo = np.minimum(los, g["lo"])
        mhi = np.maximum(his, g["hi"])
        costs = np.sqrt(((mhi - mlo) ** 2).sum(axis=1) / t)
        costs[idx] = math.inf
        best = int(np.argmin(costs))  # first minimum == reference strict-<
        if not math.isfinite(costs[best]):
            break  # no mergeable partner (reference: best_partner_idx == -1)
        partner = groups[best]
        if partner["count"] >= g["count"]:
            dom_sax, dom_level = partner["sax"], partner["level"]
        else:
            dom_sax, dom_level = g["sax"], g["level"]
        merged = {
            "sax": dom_sax,
            "level": dom_level,
            "count": g["count"] + partner["count"],
            "lo": mlo[best],
            "hi": mhi[best],
            "members": g["members"] + partner["members"],
        }
        i1, i2 = sorted([idx, best], reverse=True)
        groups.pop(i1)
        groups.pop(i2)
        groups.append(merged)

    # finalize groups: GroupID = position+1, exact VL from merged envelope
    out_groups = []
    mapping_rows = []
    for gid0, g in enumerate(groups):
        diff = g["hi"] - g["lo"]
        vl = math.sqrt(float(np.sum(diff**2)) / t)
        out_groups.append(
            {"sax": g["sax"], "level": g["level"], "count": g["count"],
             "lower": g["lo"], "upper": g["hi"], "vl": vl}
        )
        for p_order, p_gid in enumerate(g["members"]):
            mapping_rows.append(
                (p_gid, gid0 + 1, p_order, [float(x) for x in g["lo"]],
                 [float(x) for x in g["hi"]], vl)
            )

    mapping = spark.createDataFrame(
        mapping_rows,
        "p_gid string, group_id int, p_order int, lower array<double>, "
        "upper array<double>, vl double",
    )

    records = tagged.join(F.broadcast(mapping), "p_gid").select(
        "original_index",
        "group_id",
        F.col("sax").alias("pattern"),
        "level",
        "values",
        "lower",
        "upper",
        "vl",
        "p_order",
        "okey",
    )
    if compute_pl:
        records = records.withColumn(
            "pl", pattern_loss_udf(F.col("values"), F.col("pattern"), F.col("level"))
        )

    avg_vl = float(np.mean([g["vl"] for g in out_groups])) if out_groups else 0.0
    if compute_pl:
        row = records.agg(
            F.sum("pl").alias("s"), F.count(F.lit(1)).alias("c")
        ).first()
        avg_pl = (row["s"] or 0.0) / row["c"] if row["c"] else 0.0
    else:
        avg_pl = float("nan")

    for p in to_unpersist:
        p.unpersist()

    return KapraGroups(records, out_groups, avg_vl, avg_pl, n_suppressed)
