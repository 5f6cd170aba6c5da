"""Delete-leg cost sweep (round 8): verify the partition-bounded
rewrite claim — delete wall should track the number of AFFECTED
partitions, not the index size or the deleted-row count.

Three deletes of ~equal row count against same-size fresh indexes:
(a) ids concentrated in ONE list, (b) ids spread across all lists,
(c) a tiny 2-id delete.  (a) vs (b) isolates the affected-partition
term; (c) shows the floor.

Usage: python tools/sweep_delete.py [sf_dir]
"""

import os
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

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"

spark = build_session(
    "delete-sweep",
    extra_conf={
        "spark.ui.enabled": "false",
        "spark.ui.showConsoleProgress": "false",
    },
)
spark.sparkContext.setLogLevel("ERROR")

emb = spark.read.parquet(sf_dir + "/embeddings.parquet").select(
    "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
)
n = emb.count()


def fresh():
    path = os.path.join(tempfile.mkdtemp(), "idx")
    build_ivf_index(emb, "vec_id", "embedding", path, n_centroids=16)
    return path


# warm the stack on a throwaway index so the three timed runs compare
warm = fresh()
delete_from_ivf_index(spark, warm, [0, 1])

pa = fresh()
hot_row = (
    spark.read.parquet(pa + "/lists")
    .groupBy("list_id")
    .agg(F.count(F.lit(1)).alias("c"), F.collect_list("vec_id").alias("ids"))
    .orderBy(F.desc("c"))
    .limit(1)
    .collect()[0]
)
one_list = [int(x) for x in hot_row["ids"]][:100]
t0 = time.time()
ra = delete_from_ivf_index(spark, pa, one_list)
wa = time.time() - t0

pb = fresh()
spread = [int(r["vec_id"]) for r in emb.limit(1000).collect()][::10][:100]
t0 = time.time()
rb = delete_from_ivf_index(spark, pb, spread)
wb = time.time() - t0

pc = fresh()
t0 = time.time()
rc = delete_from_ivf_index(spark, pc, [3, 7])
wc = time.time() - t0

print(
    f"n={n}  concentrated: {ra['n_deleted']} rows / "
    f"{len(ra['affected_list_ids'])} lists = {wa:.2f}s | spread: "
    f"{rb['n_deleted']} rows / {len(rb['affected_list_ids'])} lists = "
    f"{wb:.2f}s | tiny: {rc['n_deleted']} rows / "
    f"{len(rc['affected_list_ids'])} lists = {wc:.2f}s"
)
