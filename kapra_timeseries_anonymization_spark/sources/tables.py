"""Parquet table registry for the driver testdata layout (TESTDATA.md).

Iceberg note: the engine's table-format access goes through this single
module; `read_table` prefers an Iceberg catalog table when the runtime jar
is configured and falls back to plain parquet directories (the sandbox
path). Writers in plans/lineage.py share the same stance.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def read_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    iceberg_tbl = os.environ.get(f"KAPRA_ICEBERG_{name.upper()}")
    if iceberg_tbl:
        return spark.read.format("iceberg").load(iceberg_tbl)
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
