"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship sketch-reaggregation pipeline on
sf0.001; ``queries()`` / ``oracle_sql()`` expose the full battery from
``spark_alchemy_spark.queries`` (one entry per implemented operator
from SURVEY.md §2, each oracle an equivalent DuckDB SQL).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

_REPO = os.path.dirname(os.path.abspath(__file__))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

from pyspark.sql import DataFrame, SparkSession  # noqa: E402


def _ship_package(spark: SparkSession) -> None:
    """Make the package importable in executor Python workers even when
    the driver owns the session (UDF closures pickle by reference)."""
    import shutil
    import tempfile

    try:
        zip_base = os.path.join(tempfile.gettempdir(), "spark_alchemy_spark_pkg")
        zip_path = zip_base + ".zip"
        if not os.path.exists(zip_path):
            shutil.make_archive(
                zip_base, "zip", root_dir=_REPO, base_dir="spark_alchemy_spark"
            )
        spark.sparkContext.addPyFile(zip_path)
    except Exception:
        pass  # already added, or local mode with cwd importability


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    The reference's headline pipeline (PostgresInteropTest.scala:73-98):
    fine-grained HLL sketches, re-aggregated with hll_merge, estimated
    with hll_cardinality.
    """
    _ship_package(spark)
    from pyspark.sql import functions as F

    from spark_alchemy_spark.functions import hll
    from spark_alchemy_spark.sources import load_tables

    tables = load_tables(spark, "/root/testdata/sf0.001", ("events",))
    events = tables["events"]
    daily = events.groupBy(
        "event_type", F.date_trunc("day", "ts").alias("day")
    ).agg(hll.hll_init_agg("user_id", 0.0015).alias("users_hll"))
    return daily.groupBy("event_type").agg(
        hll.hll_cardinality(hll.hll_merge("users_hll")).alias("approx_users")
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from spark_alchemy_spark.queries import QUERIES

    def _wrap(fn):
        def run(spark: SparkSession, sf_dir: str) -> DataFrame:
            _ship_package(spark)
            return fn(spark, sf_dir)

        return run

    return {name: _wrap(fn) for name, fn in QUERIES.items()}


def oracle_sql() -> dict[str, str]:
    from spark_alchemy_spark.queries import ORACLES

    return dict(ORACLES)
