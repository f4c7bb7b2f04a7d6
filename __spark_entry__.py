"""Driver contract for the spark-graft builder (PySpark target).

``entry`` runs the flagship road x grid classification join on sf0.001;
``queries``/``oracle_sql`` expose every implemented operator with its DuckDB
oracle twin (see osm_processing_pipeline_spark/registry.py).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from osm_processing_pipeline_spark import registry
from osm_processing_pipeline_spark.session import apply_runtime_confs

SF_SMOKE = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    apply_runtime_confs(spark)
    return registry.QUERIES["q01_road_grid_classification"](spark, SF_SMOKE)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(registry.QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(registry.ORACLES)
