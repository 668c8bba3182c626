"""Clean-room numpy oracle of the reference KAPRA / naive pipelines.

This is NOT the engine — it is the test oracle: a compact, single-process
re-statement of the reference's semantics (control flow, dict-insertion
ordering, stable sorts, strict-< argmin tie-breaks, domination rules) used
to assert that the distributed Spark pipelines produce *identical* group
assignments, envelopes and loss metrics.

Semantics sources (all in /root/reference):
- KAPRA bottom-up: src/kapra_anonymization.py:46-333
- Naive top-down:  src/naive_anonymization.py:18-341, src/k_anon.py:24-121
- Kernels:         src/sax_utils.py, src/kapra_utils.py

The oracle itself is validated against the reference's committed golden
output (docs/data/kapra_anonymized.csv) in test_oracle_vs_reference.py.
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field

import numpy as np

from kapra_timeseries_anonymization_spark.functions.kernels import (
    envelope,
    envelope_vl,
    merge_envelopes,
    pattern_loss_single,
    sax_block,
)


# ---------------------------------------------------------------------------
# KAPRA bottom-up pipeline (reference src/kapra_anonymization.py)
# ---------------------------------------------------------------------------

@dataclass
class KapraResult:
    # per surviving record, in output row order
    record_index: list[int]
    group_id: list[int]          # 1-based GroupID
    pattern: list[str]           # per-record P-subgroup SAX word
    level: list[int]             # per-record P-subgroup level
    pl: list[float]
    # per k-group, in GroupID order
    group_lower: list[np.ndarray]
    group_upper: list[np.ndarray]
    group_vl: list[float]
    suppressed: list[int]        # record indices dropped (<P residue)
    avg_vl: float
    avg_pl: float


def kapra_pipeline(
    series: np.ndarray, K: int = 8, P: int = 2, sax_level: int = 8,
    n_segments: int = 4,
) -> KapraResult:
    series = np.asarray(series, dtype=np.float64)
    n = series.shape[0]
    rec_sax = [""] * n
    rec_level = [sax_level] * n

    def group_by_sax(rec_list: list[int], level: int) -> dict[str, list[int]]:
        words = sax_block(series[rec_list], level, n_segments)
        groups: dict[str, list[int]] = {}
        for r, w in zip(rec_list, words):
            rec_sax[r] = w
            rec_level[r] = level
            groups.setdefault(w, []).append(r)
        return groups

    # Phase 1: group everyone at max level; >=P groups are final P-groups.
    p_groups: list[dict] = []   # {'sax','level','members'}
    bad: list[int] = []
    for sax, members in group_by_sax(list(range(n)), sax_level).items():
        if len(members) >= P:
            p_groups.append({"sax": sax, "level": sax_level, "members": members})
        else:
            bad.extend(members)

    # Phase 2: recycle bad records at decreasing level, floor level 3
    # (reference kapra_anonymization.py:131 — code's floor wins over docs).
    level = sax_level - 1
    while bad and level >= 3:
        new_bad: list[int] = []
        for sax, members in group_by_sax(bad, level).items():
            if len(members) >= P:
                p_groups.append({"sax": sax, "level": level, "members": members})
            else:
                new_bad.extend(members)
        bad = new_bad
        level -= 1

    suppressed: list[int] = []
    if bad:
        if len(bad) >= P:
            # '*' residue group at symbolic level 0; members keep their
            # last-pass (level 3) sax/level metadata.
            p_groups.append({"sax": "*", "level": 0, "members": bad})
        else:
            suppressed = list(bad)

    # Phase 3: greedy min-VL merge until every group >= K
    # (reference kapra_anonymization.py:185-244). Costs depend only on the
    # envelope, so we merge compact (count, lo, hi) summaries — exact.
    groups = []
    for g in p_groups:
        lo, hi, _ = envelope(series[g["members"]])
        groups.append({**g, "lo": lo, "hi": hi, "count": len(g["members"])})

    while True:
        invalid = [i for i, g in enumerate(groups) if g["count"] < K]
        if not invalid:
            break
        invalid.sort(key=lambda i: groups[i]["count"])  # stable
        idx = invalid[0]
        g = groups[idx]
        best, best_cost = -1, math.inf
        for i, og in enumerate(groups):
            if i == idx:
                continue
            lo, hi = merge_envelopes(g["lo"], g["hi"], og["lo"], og["hi"])
            cost = envelope_vl(lo, hi)
            if cost < best_cost:
                best_cost, best = cost, i
        if best == -1:
            break
        partner = groups[best]
        if partner["count"] >= g["count"]:     # domination: ties -> partner
            dom_sax, dom_level = partner["sax"], partner["level"]
        else:
            dom_sax, dom_level = g["sax"], g["level"]
        lo, hi = merge_envelopes(g["lo"], g["hi"], partner["lo"], partner["hi"])
        merged = {
            "sax": dom_sax,
            "level": dom_level,
            "members": g["members"] + partner["members"],
            "lo": lo,
            "hi": hi,
            "count": g["count"] + partner["count"],
        }
        i1, i2 = sorted([idx, best], reverse=True)
        groups.pop(i1)
        groups.pop(i2)
        groups.append(merged)

    # Output + metrics (reference kapra_anonymization.py:253-315)
    out = KapraResult([], [], [], [], [], [], [], [], suppressed, 0.0, 0.0)
    total_pl = 0.0
    total_records = 0
    for gid, g in enumerate(groups):
        lo, hi, vl = envelope(series[g["members"]])
        out.group_lower.append(lo)
        out.group_upper.append(hi)
        out.group_vl.append(vl)
        for r in g["members"]:
            r_level = rec_level[r]
            if r_level >= 3:
                try:
                    pl = pattern_loss_single(series[r], rec_sax[r], r_level)
                except Exception:
                    pl = 0.0
            else:
                pl = 1.0
            total_pl += pl
            out.record_index.append(r)
            out.group_id.append(gid + 1)
            out.pattern.append(rec_sax[r])
            out.level.append(r_level)
            out.pl.append(pl)
        total_records += g["count"]
    out.avg_vl = float(np.mean(out.group_vl)) if groups else 0.0
    out.avg_pl = total_pl / total_records if total_records else 0.0
    return out


# ---------------------------------------------------------------------------
# Naive top-down pipeline (reference src/naive_anonymization.py + k_anon.py)
# ---------------------------------------------------------------------------

@dataclass
class _Node:
    data: list[int]
    level: int
    pattern: str
    size: int
    label: str = "intermediate"
    children: list = field(default_factory=list)


def _mondrian(series_int: np.ndarray, idx: list[int], k: int) -> list[list[int]]:
    """Mondrian-like top-down split (reference src/k_anon.py:24-65).

    Sorts member lists in place (stable, like the reference's list.sort) so
    rejected splits still leave the partition in sorted order.
    """
    if len(idx) < 2 * k:
        return [idx]
    n_cols = series_int.shape[1]
    best_col, max_spread = None, -1
    for c in range(n_cols):
        vals = series_int[idx, c]
        spread = int(vals.max() - vals.min())
        if spread > max_spread:
            max_spread = spread
            best_col = c
    if best_col is None or max_spread == 0:
        return [idx]
    idx.sort(key=lambda i: series_int[i, best_col])  # stable
    mid = len(idx) // 2
    lhs, rhs = idx[:mid], idx[mid:]
    if len(lhs) >= k and len(rhs) >= k:
        return _mondrian(series_int, lhs, k) + _mondrian(series_int, rhs, k)
    return [idx]


def _sax_word(series_int: np.ndarray, i: int, level: int, n_segments: int = 4) -> str:
    if level <= 0:
        return ""
    return str(sax_block(series_int[i : i + 1].astype(np.float64), level, n_segments)[0])


def _node_split(series_int: np.ndarray, node: _Node, P: int, max_level: int) -> None:
    """Recursive node splitting (reference naive_anonymization.py:39-140)."""
    if node.label == "good-leaf":
        return
    if node.size < P:
        node.label = "bad-leaf"
        return
    if node.level == max_level:
        node.label = "good-leaf"
        return
    if P <= node.size < 2 * P:
        # in-place level maximization while all records share one pattern
        cur_level, cur_pattern = node.level, node.pattern
        while cur_level < max_level:
            nxt = cur_level + 1
            pats = [_sax_word(series_int, r, nxt) for r in node.data]
            if len(set(pats)) == 1:
                cur_level, cur_pattern = nxt, pats[0]
            else:
                break
        node.level, node.pattern, node.label = cur_level, cur_pattern, "good-leaf"
        return
    nxt = node.level + 1
    groups: dict[str, list[int]] = {}
    for r in node.data:
        groups.setdefault(_sax_word(series_int, r, nxt), []).append(r)
    valid: list[_Node] = []
    small: list[_Node] = []
    for pat, rows in groups.items():
        child = _Node(rows, nxt, pat, len(rows))
        (valid if len(rows) >= P else small).append(child)
    total_small = sum(c.size for c in small)
    if total_small >= P:
        merged_data: list[int] = []
        for c in small:
            merged_data.extend(c.data)
        # child_merge keeps the PARENT's level/pattern and is frozen good
        # (reference naive_anonymization.py:114-128)
        cm = _Node(merged_data, node.level, node.pattern, len(merged_data),
                   label="good-leaf")
        valid.append(cm)
        small = []
    valid.extend(small)
    if valid:
        node.children = valid
        for child in node.children:
            _node_split(series_int, child, P, max_level)
    else:
        node.children = []
        node.label = "good-leaf"


def _collect_leaves(node: _Node) -> list[_Node]:
    if not node.children:
        return [node]
    out: list[_Node] = []
    for c in node.children:
        out.extend(_collect_leaves(c))
    return out


@dataclass
class NaiveResult:
    record_index: list[int]
    group_id: list[int]
    pattern: list[str]
    level: list[int]
    leaf_ord: list[int]          # leaf enumeration in output order
    leaf_lower: list[np.ndarray]  # per output row (leaf envelope)
    leaf_upper: list[np.ndarray]
    leaf_vl: list[float]          # per output row, rounded to 4 decimals
    avg_vl: float
    avg_pl: float


def naive_pipeline(
    series_int: np.ndarray, K: int = 8, P: int = 2, max_level: int = 10
) -> NaiveResult:
    series_int = np.asarray(series_int)
    n = series_int.shape[0]

    # Phase 1: Mondrian partitioning -> GroupID 1..G in DFS order
    parts = _mondrian(series_int, list(range(n)), K)

    # Phase 2+3 per k-group in GroupID order (pandas groupby sorts keys)
    final_leaves: list[tuple[int, _Node]] = []  # (group_id, leaf)
    for gid, members in enumerate(parts, start=1):
        root = _Node(list(members), 1, _sax_word(series_int, members[0], 1),
                     len(members))
        _node_split(series_int, root, P, max_level)
        leaves = _collect_leaves(root)
        good = [l for l in leaves if l.label == "good-leaf"]
        bad = [l for l in leaves if l.label == "bad-leaf"]
        if bad:
            if not good:
                merged_all = _Node([], 2, "*", 0, "good-leaf")
                for l in bad:
                    merged_all.data.extend(l.data)
                merged_all.size = len(merged_all.data)
                good = [merged_all]
            else:
                for bl in bad:
                    bl_mean = series_int[bl.data].astype(np.float64).mean(axis=0)
                    best, min_d = None, math.inf
                    for gl in good:
                        try:
                            d = pattern_loss_single(bl_mean, gl.pattern, gl.level)
                        except Exception:
                            d = math.inf
                        if d < min_d:
                            min_d, best = d, gl
                    if best is not None:
                        best.data.extend(bl.data)
                        best.size += bl.size
        final_leaves.extend((gid, l) for l in good)

    res = NaiveResult([], [], [], [], [], [], [], [], 0.0, 0.0)
    total_pl, total_records, sum_vl = 0.0, 0, 0.0
    for leaf_ord, (gid, leaf) in enumerate(final_leaves):
        lo, hi, vl = envelope(series_int[leaf.data].astype(np.float64))
        vl4 = round(vl, 4)
        for r in leaf.data:
            res.record_index.append(r)
            res.group_id.append(gid)
            res.pattern.append(leaf.pattern)
            res.level.append(leaf.level)
            res.leaf_ord.append(leaf_ord)
            res.leaf_lower.append(lo)
            res.leaf_upper.append(hi)
            res.leaf_vl.append(vl4)
            sum_vl += vl4
            try:
                if leaf.level >= 3:
                    pl = pattern_loss_single(
                        series_int[r].astype(np.float64), leaf.pattern, leaf.level
                    )
                else:
                    pl = 1.0
                total_pl += pl
            except Exception:
                pass
            total_records += 1
    res.avg_vl = sum_vl / total_records if total_records else 0.0
    res.avg_pl = total_pl / total_records if total_records else 0.0
    return res
