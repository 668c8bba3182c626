"""Multi-JVM deployment regression (VERDICT r04 #1).

Runs the flagship pipeline on ``local-cluster[2,2,2048]`` — Spark's real
standalone-style deployment where executors are SEPARATE JVM processes
with their own block managers — and asserts the result is identical to
the single-JVM answer. This is the only test that exercises for real:

- ``ship_package``'s addPyFile path feeding executor Python workers that
  do NOT share the driver process (the --py-files deployment shape);
- ``localCheckpoint`` blocks living in executor block managers (the
  checkpoint LIFETIME RULE's stated failure domain, operators/kapra.py);
- broadcast map-backs crossing process boundaries.

Runs in a subprocess: a Python process owns at most one SparkContext and
the suite's session fixture already holds a local[4] one.
"""

import json
import os
import subprocess
import sys

_JOB = r"""
import json, sys
from kapra_timeseries_anonymization_spark.session import build_session
from kapra_timeseries_anonymization_spark.sources.transcripts import (
    conv_turn_rate_series, transcripts_from_events)
from kapra_timeseries_anonymization_spark.operators.kapra import kapra_anonymize

spark = build_session("lc-test", master=sys.argv[1])
t = transcripts_from_events(spark, sys.argv[2])
series = conv_turn_rate_series(t, n_buckets=8)
res = kapra_anonymize(series, K=8, P=2, sax_level=8, t=8)
rows = sorted(
    (r["original_index"], r["group_id"], r["lower"], r["upper"])
    for r in res.records.collect()
)
print("RESULT " + json.dumps({
    "n": len(rows),
    "groups": len(res.groups),
    "avg_vl": round(res.avg_vl, 6),
    "avg_pl": round(res.avg_pl, 6),
    "rows": rows,
}))
spark.stop()
"""

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")


def _run(master: str) -> dict:
    env = dict(os.environ)
    env["PYTHONPATH"] = os.path.dirname(os.path.dirname(
        os.path.abspath(__file__)))
    out = subprocess.run(
        [sys.executable, "-c", _JOB, master, SF_DIR],
        capture_output=True, text=True, timeout=600, env=env,
    )
    assert out.returncode == 0, out.stderr[-4000:]
    line = [ln for ln in out.stdout.splitlines() if ln.startswith("RESULT ")]
    assert line, out.stdout[-2000:]
    return json.loads(line[-1][len("RESULT "):])


def test_flagship_identical_across_deployment_modes():
    single = _run("local[4]")
    multi = _run("local-cluster[2,2,2048]")
    assert multi == single
    assert multi["n"] > 0 and multi["groups"] >= 1


_NAIVE_JOB = r"""
import json, sys
from pyspark.sql import functions as F
from kapra_timeseries_anonymization_spark.session import build_session
from kapra_timeseries_anonymization_spark.operators.naive import naive_anonymize

spark = build_session("lc-naive-test", master=sys.argv[1])
# deterministic partition-independent synth (same scheme as
# tools/scale_run.py); rank_head_rows=1 forces the r05 head-rank path
# so its range exchange + broadcast offsets cross executor JVMs;
# local_threshold=64 exercises the in-task local-finish applyInPandas
# on real (non-driver) python workers.
src = spark.range(3000).select(
    F.col("id").alias("original_index"),
    F.array(*[
        F.pmod(F.xxhash64("id", F.lit(i)), F.lit(50)).cast("double")
        for i in range(8)
    ]).alias("values"),
)
res = naive_anonymize(src, K=8, P=2, max_level=10, t=8,
                      local_threshold=64, rank_head_rows=1)
rows = sorted(
    (r["original_index"], r["group_id"]) for r in res.records.collect()
)
print("RESULT " + json.dumps({
    "n": len(rows),
    "groups": res.n_groups,
    "avg_vl": round(res.avg_vl, 6),
    "avg_pl": round(res.avg_pl, 6),
    "rows": rows,
}))
spark.stop()
"""


def _run_naive(master: str) -> dict:
    env = dict(os.environ)
    env["PYTHONPATH"] = os.path.dirname(os.path.dirname(
        os.path.abspath(__file__)))
    out = subprocess.run(
        [sys.executable, "-c", _NAIVE_JOB, master],
        capture_output=True, text=True, timeout=600, env=env,
    )
    assert out.returncode == 0, out.stderr[-4000:]
    line = [ln for ln in out.stdout.splitlines() if ln.startswith("RESULT ")]
    assert line, out.stdout[-2000:]
    return json.loads(line[-1][len("RESULT "):])


def test_naive_r05_paths_identical_across_deployment_modes():
    """The r05 Mondrian paths (head-rank range exchange, in-task
    local-finish applyInPandas, per-round eager localCheckpoints) on
    real separate executor JVMs must match single-JVM output exactly."""
    single = _run_naive("local[4]")
    multi = _run_naive("local-cluster[2,2,2048]")
    assert multi == single
    assert multi["n"] == 3000 and multi["groups"] >= 1


_RESUME_JOB = r"""
import json, sys
from pyspark.sql import functions as F
from kapra_timeseries_anonymization_spark.session import build_session
from kapra_timeseries_anonymization_spark.plans.lineage import (
    materialize_cascade, read_lineage, read_tier)

spark = build_session("lc-resume-test", master=sys.argv[1])
events = spark.read.parquet(sys.argv[2] + "/events.parquet")
base = sys.argv[3]

# split the input at the median day: run-0 sees only the early days
# (a mid-ingest crash analogue), run-1 resumes over the full input
days = sorted(r[0] for r in
              events.select(F.to_date("ts").cast("string")).distinct()
              .collect())
cutoff = days[len(days) // 2]
early = events.filter(F.to_date("ts").cast("string") < cutoff)

counts_a = materialize_cascade(
    spark, early, base, ["event_type"], "ts", "value", run_id="run-0")
counts_b = materialize_cascade(
    spark, events, base, ["event_type"], "ts", "value", run_id="run-1")

lineage = sorted(
    (r["tier"], r["partition_key"], r["row_count"],
     round(r["metric_sum"], 6), r["run_id"])
    for r in read_lineage(spark, base).collect()
)
tier_1d = sorted(
    (r["event_type"], str(r["bucket"]), r["n"], round(r["sum_value"], 6),
     round(r["min_value"], 6), round(r["max_value"], 6))
    for r in read_tier(spark, base, "1d").collect()
)
print("RESULT " + json.dumps({
    "counts_a": counts_a, "counts_b": counts_b,
    "lineage": lineage, "tier_1d": tier_1d,
}))
spark.stop()
"""


def _run_resume(master: str, base: str) -> dict:
    env = dict(os.environ)
    env["PYTHONPATH"] = os.path.dirname(os.path.dirname(
        os.path.abspath(__file__)))
    out = subprocess.run(
        [sys.executable, "-c", _RESUME_JOB, master, SF_DIR, base],
        capture_output=True, text=True, timeout=600, env=env,
    )
    assert out.returncode == 0, out.stderr[-4000:]
    line = [ln for ln in out.stdout.splitlines() if ln.startswith("RESULT ")]
    assert line, out.stdout[-2000:]
    return json.loads(line[-1][len("RESULT "):])


def test_lineage_resume_identical_across_deployment_modes(tmp_path):
    """north_rule: "resumable from checkpoint with per-partition lineage
    + metrics ... on a multi-executor cluster". A mid-ingest-crash
    analogue (run-0 over the early half of the days, run-1 resuming over
    the full input) must behave identically on real separate executor
    JVMs: same partitions written per run (dynamic partition overwrite +
    broadcast anti-join against the lineage log crossing block
    managers), same lineage rows (watermarks/row counts/metric
    accumulators computed in executor processes), same final 1d tier."""
    single = _run_resume("local[4]", str(tmp_path / "single"))
    multi = _run_resume("local-cluster[2,2,2048]", str(tmp_path / "multi"))
    assert multi == single
    # the resume actually resumed: run-1 skipped every run-0 partition
    runs = {}
    for tier, pkey, *_rest, run_id in multi["lineage"]:
        runs.setdefault(run_id, set()).add((tier, pkey))
    assert runs["run-0"] and runs["run-1"]
    assert not (runs["run-0"] & runs["run-1"])
    assert multi["counts_b"]["1m"] > 0 and multi["tier_1d"]


_STREAM_JOB = r"""
import json, sys
from pyspark.sql import functions as F
from kapra_timeseries_anonymization_spark.session import build_session
from kapra_timeseries_anonymization_spark.sources.transcripts import (
    synth_transcripts)
from kapra_timeseries_anonymization_spark.streaming.ingest import (
    run_stream_to_tier)

spark = build_session("lc-stream-test", master=sys.argv[1])
base = sys.argv[2]
src, out, ckpt = base + "/src", base + "/out", base + "/ckpt"

t = synth_transcripts(spark, n_convs=40, mean_turns=20)
closer = spark.createDataFrame(
    [("c_closer", 0, "user", "end", "", "2024-02-01 00:00:00")],
    "conv_id string, turn_idx int, role string, text string, "
    "tool string, ts_s string",
).select("conv_id", "turn_idx", "role", "text", "tool",
         F.col("ts_s").cast("timestamp").alias("ts"))
t.unionByName(closer).write.parquet(src)

run_stream_to_tier(spark, src, out, ckpt)
n_first = spark.read.parquet(out).count()
# restart against the same checkpoint: exactly-once => no new rows
run_stream_to_tier(spark, src, out, ckpt)
all_rows = spark.read.parquet(out).collect()
rows = sorted(
    (r["conv_id"], str(r["bucket"]), r["n"], r["sum_value"],
     r["min_value"], r["max_value"])
    for r in all_rows if r["conv_id"] != "c_closer"
)
print("RESULT " + json.dumps({
    "n_first": n_first,
    "no_new_rows": len(all_rows) == n_first,
    # append mode: the closer's own window sits above the watermark and
    # must NOT be emitted — record it so both modes must agree.
    "closer_emitted": any(r["conv_id"] == "c_closer" for r in all_rows),
    "rows": rows,
}))
spark.stop()
"""


def _run_stream(master: str, base: str) -> dict:
    env = dict(os.environ)
    env["PYTHONPATH"] = os.path.dirname(os.path.dirname(
        os.path.abspath(__file__)))
    out = subprocess.run(
        [sys.executable, "-c", _STREAM_JOB, master, base],
        capture_output=True, text=True, timeout=600, env=env,
    )
    assert out.returncode == 0, out.stderr[-4000:]
    line = [ln for ln in out.stdout.splitlines() if ln.startswith("RESULT ")]
    assert line, out.stdout[-2000:]
    return json.loads(line[-1][len("RESULT "):])


def test_streaming_tier_identical_across_deployment_modes(tmp_path):
    """The streaming 1m tier (watermarked windowed agg + streaming
    checkpoint, availableNow) on real separate executor JVMs: the HDFS-
    backed state store partitions and the exactly-once restart live in
    executor processes here, not the driver JVM. Output rows and the
    no-new-rows-on-restart property must match single-JVM exactly."""
    single = _run_stream("local[4]", str(tmp_path / "single"))
    multi = _run_stream("local-cluster[2,2,2048]", str(tmp_path / "multi"))
    assert multi == single
    assert multi["rows"] and multi["no_new_rows"] is True
    assert multi["closer_emitted"] is False
