"""KAPRA bottom-up (k,P)-anonymization as a distributed Spark pipeline.

Semantics: exact match to the reference pipeline
(/root/reference/src/kapra_anonymization.py:46-333):

- Phase 1: SAX at max level, hash-group, split good (>= P) / bad.
- Phase 2: recycle bad records at decreasing levels (floor 3, code wins
  over docs); leftover residue becomes one '*' group if >= P, else is
  suppressed.
- Phase 3: greedy min-VL merge of P-groups until all >= K, with the
  reference's exact ordering semantics (stable sort by size, first-min
  argmin, domination ties -> partner, pop/append list order).

Spark-first architecture — "reduce to pattern space, orchestrate in
pattern space, broadcast back":

1. ONE vectorized pandas-UDF pass computes the SAX word at *every* level
   (z-norm + PAA once per record) -> `sax_vec` column.
2. ONE map-side-combinable aggregation groups records by their full
   `sax_vec` into pattern *combos*: (count, min_index, envelope lo/hi).
   Records with identical sax vectors can never be separated by any phase
   of the reference algorithm, so combos are a lossless reduction. Shuffle
   volume is O(C * T) where C = #distinct vectors (bounded by the cross
   product of breakpoint cells, in practice << N) — not O(N).
3. The recycle loop and the greedy merge run on the DRIVER over the C
   combo summaries, replaying the reference's dict-insertion order, stable
   sorts and strict-< argmin exactly (tuple keys simulate the reference's
   record-list ordering; a combo's records are contiguous in it).
4. A tiny (vector -> group assignment) map is broadcast-joined back; the
   only per-record Python after step 1 is the pattern-loss UDF.

At 100 TB this is: one UDF scan (embarrassingly parallel), one tiny
combined shuffle, one broadcast join — no iteration ever touches the data.
Driver state is O(C * (T + levels)); if C ever approached N (near-unique
PAA cells) the combo table itself is the fallback unit of distribution,
but with SAX alphabets <= 20 and 4 segments C is bounded by the joint
breakpoint-cell count (28^4 for levels 3..8).
"""

from __future__ import annotations

import math
from dataclasses import dataclass

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.sax_udfs import make_sax_levels_udf, pattern_loss_udf
from .envelope import envelope_agg


@dataclass
class KapraGroups:
    """Result of the KAPRA pipeline.

    ``records``: one row per surviving input record with columns
      (original_index, group_id, pattern, level, values, lower, upper, vl,
       pl, p_order, c_order) — order by (group_id, p_order, c_order,
      original_index) to reproduce the reference's exact output row order.
    ``groups``: driver-side list in GroupID order:
      dicts with sax, level, count, lower, upper, vl.
    """

    records: DataFrame
    groups: list[dict]
    avg_vl: float
    avg_pl: float
    n_suppressed: int


class _Combo:
    __slots__ = ("vec", "count", "min_idx", "lo", "hi", "chain")

    def __init__(self, vec, count, min_idx, lo, hi):
        self.vec = vec
        self.count = count
        self.min_idx = min_idx
        self.lo = lo
        self.hi = hi
        # per-pass bad-group rank chain: the bad_records list is rebuilt
        # each pass (most recent group rank dominates), so a record's
        # position at formation is (reversed(chain), idx) lexicographically
        self.chain: tuple = ()


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
        .withColumn("sax_vec", sax_udf(F.col("values")))
        .withColumn("combo_key", F.concat_ws("\x1f", F.col("sax_vec")))
        .persist()
    )
    # materialize the cache BEFORE the combo join below: its two branches
    # would otherwise race to compute the same uncached partitions (block-
    # lock contention + a duplicate SAX-UDF worker wave — measured 27x
    # slower at local[32] on 120k series)
    base.count()

    # ---- lossless reduction to pattern space (one combined shuffle)
    combo_df = envelope_agg(
        base, ["combo_key", "sax_vec"], "values", t, with_vl=False
    ).join(
        base.groupBy("combo_key").agg(F.min("original_index").alias("min_idx")),
        "combo_key",
    )
    # driver-safety guard: the collect below is exact and tiny for real
    # SAX pattern spaces (C bounded by the joint breakpoint-cell count);
    # refuse clearly rather than OOM the driver if a caller feeds data
    # whose pattern space approaches the row count
    combo_df = combo_df.persist()
    n_combos = combo_df.count()
    if n_combos > 5_000_000:
        combo_df.unpersist()
        base.unpersist()
        raise ValueError(
            f"pattern space too large to orchestrate on the driver "
            f"({n_combos} distinct SAX vectors); lower sax_level / "
            f"n_segments or pre-bucket the series"
        )
    combo_rows = combo_df.collect()
    combo_df.unpersist()
    combos = [
        _Combo(list(r["sax_vec"]), int(r["count"]), int(r["min_idx"]),
               np.asarray(r["lower"], dtype=np.float64),
               np.asarray(r["upper"], dtype=np.float64))
        for r in combo_rows
    ]
    # reference record order is original_index asc; combos inherit the
    # order of their first record
    combos.sort(key=lambda c: c.min_idx)

    # ---- Phases 1+2 on combos (driver; replays reference ordering exactly)
    p_groups: list[dict] = []
    bad = combos
    for pass_idx, level in enumerate(range(sax_level, 2, -1)):
        if not bad:
            break
        groups: dict[str, list[_Combo]] = {}
        for c in bad:
            groups.setdefault(c.vec[level - 3], []).append(c)
        # list order below replays the reference's bad_records ordering at
        # combo granularity (dict insertion order; in-group order preserved)
        new_bad: list[_Combo] = []
        for g_rank, (word, cs) in enumerate(groups.items()):
            total = sum(c.count for c in cs)
            if total >= P:
                p_groups.append(
                    {"sax": word, "level": level, "members": cs, "count": total}
                )
            else:
                for c in cs:
                    c.chain = c.chain + (g_rank,)
                new_bad.extend(cs)
        bad = new_bad

    n_suppressed = 0
    if bad:
        n_bad = sum(c.count for c in bad)
        if n_bad >= P:
            # '*' residue group; records keep their last-pass metadata
            # (level-3 word) — reference kapra_anonymization.py:163-169
            p_groups.append(
                {"sax": "*", "level": 0, "members": bad, "count": n_bad}
            )
        else:
            n_suppressed = n_bad

    if not p_groups:
        raise ValueError("no records survived P-grouping")

    # attach envelopes to p-groups (exact: elementwise min/max of combos)
    for g in p_groups:
        g["lo"] = np.minimum.reduce([c.lo for c in g["members"]])
        g["hi"] = np.maximum.reduce([c.hi for c in g["members"]])

    # ---- Phase 3: reference-exact greedy merge (driver, vectorized argmin)
    # Slot-array layout instead of a list of dicts: each merge only
    # fancy-indexes the live slots (O(G*T) memcpy) rather than np.stack-ing
    # G python arrays per round — semantics identical (order list replays
    # the reference's pop/append list order; np.argmin returns the FIRST
    # minimum in that order == the reference's strict-< scan).
    G0 = len(p_groups)
    cap = 2 * G0 + 1  # every merge adds one slot, at most G0-1 merges
    slot_lo = np.empty((cap, t), dtype=np.float64)
    slot_hi = np.empty((cap, t), dtype=np.float64)
    slot_count = np.empty(cap, dtype=np.int64)
    slot_meta: list[dict] = [None] * cap  # sax, level, pgs per slot
    for i, g in enumerate(p_groups):
        slot_lo[i] = g["lo"]
        slot_hi[i] = g["hi"]
        slot_count[i] = g["count"]
        slot_meta[i] = {"sax": g["sax"], "level": g["level"], "pgs": [g]}
    order: list[int] = list(range(G0))  # current reference list order
    n_slots = G0
    while True:
        seq = np.asarray(order)
        counts = slot_count[seq]
        inv_mask = counts < K
        if not inv_mask.any():
            break
        # stable sort by count -> first element = min count, earliest pos
        inv_pos = np.flatnonzero(inv_mask)
        pos = int(inv_pos[np.argmin(counts[inv_pos])])
        s_idx = order[pos]
        mlo = np.minimum(slot_lo[seq], slot_lo[s_idx])
        mhi = np.maximum(slot_hi[seq], slot_hi[s_idx])
        costs = np.sqrt(((mhi - mlo) ** 2).sum(axis=1) / t)
        costs[pos] = math.inf
        best_pos = int(np.argmin(costs))  # first minimum == ref strict-<
        if not math.isfinite(costs[best_pos]):
            break  # no partner (reference: best_partner_idx == -1)
        b_idx = order[best_pos]
        g_meta, p_meta = slot_meta[s_idx], slot_meta[b_idx]
        if slot_count[b_idx] >= slot_count[s_idx]:
            dom_sax, dom_level = p_meta["sax"], p_meta["level"]
        else:
            dom_sax, dom_level = g_meta["sax"], g_meta["level"]
        new = n_slots
        n_slots += 1
        slot_lo[new] = mlo[best_pos]
        slot_hi[new] = mhi[best_pos]
        slot_count[new] = slot_count[s_idx] + slot_count[b_idx]
        slot_meta[new] = {
            "sax": dom_sax,
            "level": dom_level,
            "pgs": g_meta["pgs"] + p_meta["pgs"],
        }
        i1, i2 = sorted([pos, best_pos], reverse=True)
        order.pop(i1)
        order.pop(i2)
        order.append(new)
    groups = [
        {"sax": slot_meta[i]["sax"], "level": slot_meta[i]["level"],
         "count": int(slot_count[i]), "lo": slot_lo[i], "hi": slot_hi[i],
         "pgs": slot_meta[i]["pgs"]}
        for i in order
    ]

    # ---- finalize: GroupID = position+1; broadcast assignment map back
    out_groups: list[dict] = []
    mapping_rows: list[tuple] = []
    for gid0, kg in enumerate(groups):
        diff = kg["hi"] - kg["lo"]
        vl = math.sqrt(float(np.sum(diff**2)) / t)
        out_groups.append(
            {"sax": kg["sax"], "level": kg["level"], "count": kg["count"],
             "lower": kg["lo"], "upper": kg["hi"], "vl": vl}
        )
        lo_l = [float(x) for x in kg["lo"]]
        hi_l = [float(x) for x in kg["hi"]]
        for p_order, pg in enumerate(kg["pgs"]):
            # within-p-group record order = (chain, original_index); equal
            # chains interleave by index, so c_order is the DENSE rank of
            # the chain among this p-group's combos
            # the bad list is rebuilt every pass, so the most recent pass's
            # group rank dominates: compare chains REVERSED
            chain_rank = {
                ch: i
                for i, ch in enumerate(
                    sorted({c.chain for c in pg["members"]},
                           key=lambda ch: ch[::-1])
                )
            }
            # record metadata: the word/level at p-group formation; for the
            # '*' group, each combo's level-3 word at level 3
            for c in pg["members"]:
                c_order = chain_rank[c.chain]
                if pg["level"] == 0:
                    r_sax, r_level = c.vec[0], 3
                else:
                    r_sax, r_level = pg["sax"], pg["level"]
                mapping_rows.append(
                    ("\x1f".join(c.vec), gid0 + 1, p_order, c_order,
                     r_sax, r_level, lo_l, hi_l, vl)
                )

    mapping = spark.createDataFrame(
        mapping_rows,
        "combo_key string, group_id int, p_order int, c_order int, "
        "pattern string, level int, lower array<double>, "
        "upper array<double>, vl double",
    )

    records = base.join(F.broadcast(mapping), "combo_key").select(
        "original_index", "group_id", "pattern", "level", "values",
        "lower", "upper", "vl", "p_order", "c_order",
    )
    if compute_pl:
        records = records.withColumn(
            "pl", pattern_loss_udf(F.col("values"), F.col("pattern"), F.col("level"))
        )
    # persist: the PL UDF + broadcast join run ONCE — the avg_pl aggregate
    # below and every caller action (count/collect/write) hit the cache
    records = records.persist()

    avg_vl = float(np.mean([g["vl"] for g in out_groups])) if out_groups else 0.0
    if compute_pl:
        row = records.agg(
            F.sum("pl").alias("s"), F.count(F.lit(1)).alias("c")
        ).first()
        avg_pl = (row["s"] or 0.0) / row["c"] if row["c"] else 0.0
    else:
        avg_pl = float("nan")
    base.unpersist()

    return KapraGroups(records, out_groups, avg_vl, avg_pl, n_suppressed)
