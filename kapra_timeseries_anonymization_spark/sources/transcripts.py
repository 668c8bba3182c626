"""Transcript source: the engine's real input shape (BASELINE input_hint).

Schema: ``conv_id:string, turn_idx:int, role:string, text:string,
tool:string, ts:timestamp`` — an Iceberg table of multi-turn
conversation/agent transcripts in production; here two deterministic
sources behind the same schema:

- :func:`transcripts_from_events` maps the driver's ``events`` table into
  transcript shape with *only engine-neutral expressions* (row_number over a
  unique ordering, integer-cast arithmetic, string concat), so the driver's
  DuckDB oracle can reproduce every row byte-for-byte — this is how the
  per-turn text-equality invariant (input_hint) is verified end-to-end.
- :func:`synth_transcripts` generates arbitrary-scale transcripts with a
  keyed hash PRNG (xxhash64 per (conv, turn) — no global seed, no
  partition-order dependence), for scale/skew benchmarks. One pathologically
  long conversation can be injected to exercise skew handling.

Scale notes: both sources are single-pass `spark.range`/scan pipelines with
no Python; the window in `transcripts_from_events` shuffles once on
user_id. At 10^12 turns the real source is an Iceberg scan partitioned by
days(ts) + bucket(conv_id); `read_table` (sources/tables.py) carries the
format switch.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .tables import read_table

# Reference parity anchor: the reference's input is a fixed-length series
# per individual (src/dataset.py:6-115); the target engine derives those
# series from transcripts instead (SURVEY.md §2.8).

TRANSCRIPT_COLS = ["conv_id", "turn_idx", "role", "text", "tool", "ts"]

#: DuckDB SQL producing EXACTLY the same rows as transcripts_from_events —
#: used as a CTE by every transcript-query oracle.
TRANSCRIPTS_ORACLE_CTE = """
    transcripts AS (
        SELECT 'c' || lpad(user_id::VARCHAR, 9, '0')          AS conv_id,
               (row_number() OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id) - 1)::INT AS turn_idx,
               NULL AS _role_tmp, event_type, event_id, value, ts
        FROM events
    ),
    transcripts2 AS (
        SELECT conv_id, turn_idx,
               CASE WHEN turn_idx % 7 = 3 THEN 'tool'
                    WHEN turn_idx % 2 = 0 THEN 'user'
                    ELSE 'assistant' END                       AS role,
               event_type || ' turn ' || event_id::VARCHAR || ' v='
                   || CAST(round(value * 100) AS BIGINT)::VARCHAR AS text,
               CASE WHEN turn_idx % 7 = 3 THEN event_type ELSE '' END AS tool,
               ts
        FROM transcripts
    )
"""


def transcripts_from_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events -> transcripts, engine-neutral and deterministic.

    conv_id = user, turn_idx = rank of the event within the user's stable
    (ts, event_id) order, text = a pure function of the event row (value is
    integer-cast after scaling so float formatting can never diverge
    between engines).
    """
    ev = read_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    t = ev.withColumn("turn_idx", (F.row_number().over(w) - 1).cast("int"))
    role = (
        F.when(F.col("turn_idx") % 7 == 3, F.lit("tool"))
        .when(F.col("turn_idx") % 2 == 0, F.lit("user"))
        .otherwise(F.lit("assistant"))
    )
    text = F.concat(
        F.col("event_type"),
        F.lit(" turn "),
        F.col("event_id").cast("string"),
        F.lit(" v="),
        F.round(F.col("value") * 100).cast("long").cast("string"),
    )
    return t.select(
        F.concat(F.lit("c"), F.lpad(F.col("user_id").cast("string"), 9, "0"))
        .alias("conv_id"),
        "turn_idx",
        role.alias("role"),
        text.alias("text"),
        F.when(F.col("turn_idx") % 7 == 3, F.col("event_type"))
        .otherwise(F.lit(""))
        .alias("tool"),
        "ts",
    )


def synth_transcripts(
    spark: SparkSession,
    n_convs: int = 1000,
    mean_turns: int = 32,
    t0: str = "2024-01-01 00:00:00",
    skew_conv_turns: int = 0,
) -> DataFrame:
    """Arbitrary-scale deterministic transcript generator (no testdata).

    Every random draw is ``xxhash64(conv, turn, salt)`` — a pure function of
    the key, so the output is identical under any partitioning or
    parallelism (the property the reference's global ``np.random.seed(42)``
    does NOT have; SURVEY §2.1 S5). ``skew_conv_turns`` > 0 appends one
    pathologically long conversation (conv_id 'c_skew') for skew tests.
    """
    conv = spark.range(n_convs).select(
        F.concat(F.lit("c"), F.lpad(F.col("id").cast("string"), 9, "0"))
        .alias("conv_id"),
        F.col("id").alias("_cid"),
        # conversation length in [mean/2, 3*mean/2), keyed by conv
        (
            F.lit(mean_turns // 2)
            + F.pmod(F.xxhash64(F.col("id"), F.lit(1)), F.lit(mean_turns))
        ).cast("int").alias("n_turns"),
    )
    if skew_conv_turns > 0:
        skew = spark.range(1).select(
            F.lit("c_skew").alias("conv_id"),
            F.lit(-1).cast("long").alias("_cid"),
            F.lit(skew_conv_turns).cast("int").alias("n_turns"),
        )
        conv = conv.unionByName(skew)
    turns = conv.select(
        "conv_id", "_cid",
        F.explode(F.sequence(F.lit(0), F.col("n_turns") - 1)).alias("turn_idx"),
    )
    h = lambda salt: F.xxhash64("_cid", "turn_idx", F.lit(salt))  # noqa: E731
    role = (
        F.when(F.pmod(h(2), F.lit(11)) == 0, F.lit("tool"))
        .when(F.col("turn_idx") % 2 == 0, F.lit("user"))
        .otherwise(F.lit("assistant"))
    )
    tools = F.array(*[F.lit(x) for x in ["search", "code", "browse", "none"]])
    words = F.array(
        *[F.lit(x) for x in (
            "plan step tool result check run query data merge scan sort"
        ).split()]
    )
    # text: 5 keyed-hash words + the turn key (unique, deterministic)
    text = F.concat_ws(
        " ",
        *[F.element_at(words, (F.pmod(h(10 + i), F.lit(11)) + 1).cast("int"))
          for i in range(5)],
        F.concat(F.lit("t"), F.col("turn_idx").cast("string")),
    )
    # inter-turn gap 1..120s keyed by (conv, turn); ts = cumulative gap
    gap = (F.pmod(h(3), F.lit(120)) + 1).cast("long")
    w = (
        Window.partitionBy("conv_id")
        .orderBy("turn_idx")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        turns.withColumn("_gap", gap)
        .withColumn(
            "ts",
            F.timestamp_seconds(
                F.lit(t0).cast("timestamp").cast("double")
                + F.sum("_gap").over(w)
            ),
        )
        .select(
            "conv_id",
            F.col("turn_idx").cast("int").alias("turn_idx"),
            role.alias("role"),
            text.alias("text"),
            F.when(
                role == "tool",
                F.element_at(tools, (F.pmod(h(4), F.lit(4)) + 1).cast("int")),
            ).otherwise(F.lit("")).alias("tool"),
            "ts",
        )
    )


def conv_turn_rate_series(
    transcripts: DataFrame, n_buckets: int = 8
) -> DataFrame:
    """Per-conversation fixed-length turn-rate series: the conversation's
    own span is split into ``n_buckets`` equal buckets, zero-filled; output
    (conv_id, values[n_buckets], original_index). This is the transcript
    analogue of the reference's H1..H8 columns and feeds KAPRA directly.

    ONE shuffle on conv_id, total: the per-conv span comes from unbounded
    min/max WINDOW functions (not an agg + join — that plan either
    broadcasts a fact-table side or adds a second exchange; the window
    reuses the same hash partitioning the bucket-count aggregate needs, so
    Catalyst schedules everything after one exchange). original_index is a
    stable hash of conv_id so downstream order-sensitive steps are
    partition-independent.
    """
    from ..operators.derive import epoch_sec

    w = Window.partitionBy("conv_id").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    t = transcripts.withColumn("_lo", epoch_sec(F.min("ts").over(w))).withColumn(
        "_hi", epoch_sec(F.max("ts").over(w))
    )
    span = F.greatest(F.col("_hi") - F.col("_lo"), F.lit(1e-9))
    b = F.least(
        F.floor((epoch_sec("ts") - F.col("_lo")) / span * n_buckets),
        F.lit(n_buckets - 1),
    ).cast("int")
    counts = t.groupBy("conv_id", b.alias("b")).agg(
        F.count(F.lit(1)).cast("double").alias("cnt")
    )
    return (
        counts.groupBy("conv_id")
        .agg(F.map_from_entries(F.collect_list(F.struct("b", "cnt"))).alias("_m"))
        .withColumn(
            "values",
            F.transform(
                F.sequence(F.lit(0), F.lit(n_buckets - 1)),
                lambda i: F.coalesce(F.col("_m")[i.cast("int")], F.lit(0.0)),
            ),
        )
        .drop("_m")
        .withColumn("original_index", F.xxhash64("conv_id"))
    )
