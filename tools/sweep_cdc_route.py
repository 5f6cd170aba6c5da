"""CDC delete-route cost sweep (round 9): measure the driver-list
(isin literal) route against the DataFrame (broadcast anti-join) route
as the deleted id set grows — the measurement behind
cdc_driver_id_cap's default.

The list route wins small sets (the literal reaches the parquet scan
as row-group min/max pruning and costs zero extra jobs); it must lose
eventually because the isin literal itself grows the plan (driver
memory + codegen time scale with the id count), while the anti-join's
cost is one broadcast of the id set.  Fresh index copy per
measurement so deletes never compound.

Usage: python tools/sweep_cdc_route.py
"""

import os
import shutil
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from spark_alchemy_spark.operators.similarity import (  # noqa: E402
    build_ivf_index,
    delete_from_ivf_index,
)
from spark_alchemy_spark.session import build_session  # noqa: E402

spark = build_session(
    "cdc-route-sweep",
    extra_conf={
        "spark.ui.enabled": "false",
        "spark.ui.showConsoleProgress": "false",
    },
)
spark.sparkContext.setLogLevel("ERROR")

N = 200_000
corpus = spark.range(N).select(
    F.col("id").alias("vec_id"),
    F.transform(
        F.sequence(F.lit(0), F.lit(3)),
        lambda i: 1.0 + F.cos(i * (1.0 + F.col("id") % 7)),
    ).alias("embedding"),
)
golden = os.path.join(tempfile.gettempdir(), "route_sweep_golden")
shutil.rmtree(golden, ignore_errors=True)
build_ivf_index(corpus, "vec_id", "embedding", golden, n_centroids=8)

print(f"{'n_ids':>8} {'list_s':>7} {'df_s':>7}")
for k in (100, 1_000, 10_000, 100_000):
    times = {}
    for route in ("list", "df"):
        path = os.path.join(tempfile.gettempdir(), f"route_sweep_{route}")
        shutil.rmtree(path, ignore_errors=True)
        shutil.copytree(golden, path)
        ids = (
            list(range(k))
            if route == "list"
            else spark.range(k).select(F.col("id").alias("vec_id"))
        )
        t0 = time.time()
        rep = delete_from_ivf_index(spark, path, ids, id_col="vec_id")
        times[route] = time.time() - t0
        assert rep["n_deleted"] == k
    print(f"{k:>8} {times['list']:>7.2f} {times['df']:>7.2f}")
