"""SparkSession construction with the engine's recommended conf.

Scale stance: these defaults are tuned for local[N] testing but every knob
is the one you would set on a 1000-executor cluster too — AQE on (runtime
shuffle-partition coalescing + skew-join splitting), Arrow on (all kernels
are pandas-UDF based), and explicit shuffle partition counts sized to the
parallelism level.
"""

from __future__ import annotations

import os
import shutil
import tempfile

from pyspark.sql import SparkSession


def ship_package(spark: SparkSession) -> None:
    """Make this package importable on executors.

    Local equivalent of ``spark-submit --py-files kapra_....zip``: zip the
    package once and register it via ``addPyFile`` so pandas-UDF workers can
    import the kernels. Idempotent per session.
    """
    if getattr(spark, "_kapra_pkg_shipped", False):
        return
    pkg_dir = os.path.dirname(os.path.abspath(__file__))
    parent = os.path.dirname(pkg_dir)
    zip_base = os.path.join(tempfile.gettempdir(),
                            "kapra_timeseries_anonymization_spark_pkg")
    # always rebuild: the archive is tiny and a stale zip would ship old
    # kernel code to the workers
    zip_path = shutil.make_archive(zip_base, "zip", root_dir=parent,
                                   base_dir=os.path.basename(pkg_dir))
    spark.sparkContext.addPyFile(zip_path)
    spark._kapra_pkg_shipped = True


#: numpy/BLAS must be single-threaded inside pandas-UDF workers: Spark
#: supplies the parallelism (one worker per core), and letting each worker
#: spawn n_cpu OpenMP/BLAS threads oversubscribes the machine quadratically
#: (measured: 3x slowdown at local[16] on the SAX/PL kernels).
_BLAS_PIN = {
    "OMP_NUM_THREADS": "1",
    "OPENBLAS_NUM_THREADS": "1",
    "MKL_NUM_THREADS": "1",
    "NUMEXPR_NUM_THREADS": "1",
}


def build_session(
    app_name: str = "kapra-ts-engine",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict | None = None,
) -> SparkSession:
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    for k, v in _BLAS_PIN.items():
        # local mode: python workers inherit the driver process env
        os.environ.setdefault(k, v)
    master = master or f"local[{cpus}]"
    cluster_conf: dict[str, str] = {}
    if master.startswith("local-cluster["):
        # real multi-JVM deployment: [n_workers, cores_per_worker, mem_mb].
        # Executors are separate processes with their own block managers —
        # the deployment shape every lifetime/broadcast mechanism is
        # designed for (VERDICT r04 #1).
        n_workers, cores_per, mem_mb = (
            int(x) for x in master[len("local-cluster[") : -1].split(",")
        )
        total_cores = n_workers * cores_per
        if shuffle_partitions is None:
            shuffle_partitions = total_cores
        cluster_conf["spark.executor.memory"] = f"{mem_mb}m"
    elif shuffle_partitions is None:
        # local[N]: one shuffle partition per core keeps every stage wide
        # without tiny-task overhead. On a real cluster this is set to
        # ~2-3x total executor cores (AQE coalesces down at runtime).
        n = master[master.index("[") + 1 : -1] if "[" in master else str(cpus)
        shuffle_partitions = cpus if n == "*" else int(n)
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        # plan DESCRIPTIONS are built eagerly per query execution (for
        # listener events, even with the UI off) at a default cap of
        # ~2^31 chars; deep iterative plans can hit it (a 2 GB string
        # build per job wedged the 10M Mondrian run, r04). 100k chars is
        # plenty for humans and bounds the cost. Display-only.
        .config("spark.sql.maxPlanStringLength", "100000")
    )
    for k, v in _BLAS_PIN.items():
        # cluster mode: ship the pin to executor-side python workers too
        builder = builder.config(f"spark.executorEnv.{k}", v)
    for k, v in cluster_conf.items():
        builder = builder.config(k, v)
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    ship_package(spark)
    return spark
