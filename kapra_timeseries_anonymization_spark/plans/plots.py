"""Analogue of the reference's fourth entry point, `generate_plots`
(/root/reference/src/generate_plots.py:28-148): VL/PL-vs-K comparison and
a cluster-envelope visualization.

The rendering libraries (matplotlib/seaborn) are NOT in this sandbox, so
the module computes the PLOT DATA with Spark — exactly what the
reference's two figures consume — and writes it as CSV; if matplotlib is
importable (production), `generate_plots` also renders the PNGs with the
same fill-between/lineplot shapes. The data path is the tested artifact;
rendering is a thin, import-gated veneer.

- metrics comparison (`:28-67`): (Algorithm, K, VL, PL) for the P=2,
  Level=8 grid slice, both algorithms.
- cluster envelope (`:69-148`): pick the first group with >= 3 members
  (reference `:90-95`), parse the '[lo-hi]' interval strings back to
  bounds (M8: regexp_extract x2), emit (t, lower, upper) rows for the
  fill_between.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# accepts int ([12-40]), decimal and scientific-notation bounds
# ([1.0E-5-2.5E-5], as naive_output_table's raw double cast can render) —
# note the literal '-' separator binds to the SECOND sign position
_NUM = r"-?\d+(?:\.\d+)?(?:[eE][+-]?\d+)?"
_IV_RE = rf"\[({_NUM})-({_NUM})\]"


def metrics_comparison_data(
    spark: SparkSession,
    series: DataFrame,
    ks: tuple[int, ...] = (5, 10, 20),
    p: int = 2,
    level: int = 8,
) -> DataFrame:
    """(algorithm, k, vl, pl) rows for the reference's two lineplots —
    the P=2/Level=8 slice of both grids, computed by the engine."""
    from .optimize import run_grid

    configs = [(k, p, level) for k in ks]
    rows = []
    for algo in ("kapra", "naive"):
        for r in run_grid(series, configs, algo=algo, t=8, parallelism=2):
            rows.append((algo.upper() if algo == "kapra" else "Naive",
                         r.k, r.vl, r.pl))
    return spark.createDataFrame(
        rows, "algorithm string, k int, vl double, pl double"
    ).orderBy("algorithm", "k")


def cluster_envelope_data(output_df: DataFrame) -> DataFrame:
    """Reference-shaped output table (GroupID, H1..Hn '[lo-hi]' strings)
    -> (t, lower, upper) rows for the selected group's envelope plot.

    Group selection replays the reference (`:90-95`): the first GroupID
    (ascending) with >= 3 members, else the first GroupID. All parsing is
    JVM-side regexp (M8)."""
    h_cols = [c for c in output_df.columns if c.startswith("H")]
    sizes = output_df.groupBy("GroupID").count()
    big = sizes.filter(F.col("count") >= 3).agg(F.min("GroupID")).first()[0]
    if big is None:
        big = sizes.agg(F.min("GroupID")).first()[0]
    one = output_df.filter(F.col("GroupID") == big).limit(1)
    pairs = F.array(*[
        F.struct(
            F.lit(i).alias("t"),
            F.regexp_extract(F.col(c), _IV_RE, 1).cast("double").alias("lower"),
            F.regexp_extract(F.col(c), _IV_RE, 2).cast("double").alias("upper"),
        )
        for i, c in enumerate(h_cols)
    ])
    return (
        one.select(
            F.col("GroupID").alias("group_id"),
            F.explode(pairs).alias("pt"),
        )
        .select("group_id", "pt.t", "pt.lower", "pt.upper")
        .orderBy("t")
    )


def generate_plots(
    spark: SparkSession,
    series: DataFrame,
    output_df: DataFrame,
    out_dir: str,
) -> dict[str, str]:
    """Write metrics_comparison.csv + cluster_visualization.csv (always)
    and the corresponding PNGs (only if matplotlib is importable).
    Returns {artifact: path}."""
    os.makedirs(out_dir, exist_ok=True)
    arts: dict[str, str] = {}

    metrics = metrics_comparison_data(spark, series).toPandas()
    mpath = os.path.join(out_dir, "metrics_comparison.csv")
    metrics.to_csv(mpath, index=False)
    arts["metrics_csv"] = mpath

    env = cluster_envelope_data(output_df).toPandas()
    epath = os.path.join(out_dir, "cluster_visualization.csv")
    env.to_csv(epath, index=False)
    arts["envelope_csv"] = epath

    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
    except ImportError:
        return arts  # sandbox: data artifacts only

    fig, axes = plt.subplots(1, 2, figsize=(15, 6))
    for algo, grp in metrics.groupby("algorithm"):
        axes[0].plot(grp["k"], grp["vl"], marker="o", label=algo)
        axes[1].plot(grp["k"], grp["pl"], marker="o", label=algo)
    axes[0].set_title("Value Loss vs K (P=2, Level=8)")
    axes[0].set_ylabel("Average Value Loss")
    axes[1].set_title("Pattern Loss vs K (P=2, Level=8)")
    axes[1].set_ylabel("Average Pattern Loss")
    for ax in axes:
        ax.set_xlabel("K")
        ax.grid(True)
        ax.legend()
    plt.tight_layout()
    ppath = os.path.join(out_dir, "metrics_comparison.png")
    plt.savefig(ppath)
    plt.close(fig)
    arts["metrics_png"] = ppath

    plt.figure(figsize=(10, 6))
    plt.fill_between(env["t"], env["lower"], env["upper"], color="gray",
                     alpha=0.3, label="Anonymization Envelope")
    plt.plot(env["t"], env["lower"], color="black", linestyle="--",
             linewidth=0.5)
    plt.plot(env["t"], env["upper"], color="black", linestyle="--",
             linewidth=0.5)
    gid = int(env["group_id"].iloc[0]) if len(env) else -1
    plt.title(f"Cluster {gid} Visualization (KAPRA)")
    plt.xlabel("Time Points")
    plt.ylabel("Value")
    plt.legend()
    cpath = os.path.join(out_dir, "cluster_visualization.png")
    plt.savefig(cpath)
    plt.close()
    arts["envelope_png"] = cpath
    return arts
