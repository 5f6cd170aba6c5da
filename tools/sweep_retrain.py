"""Retrain-leg cost sweep (round 9): verify the cost-shape claim —
retrain is the ONE O(index) lifecycle leg (it reassigns and rewrites
every row), so its wall should track the INDEX SIZE, while an append
of the same drifted batch tracks only the batch, and a rebalance
tracks only the hot lists.

Three index sizes, same drifted batch appended to each, then a full
retrain: the append wall should stay ~flat across sizes while the
retrain wall grows with the index — the measured justification for
gating retrain behind the drift-streak trigger instead of running it
per batch.

Usage: python tools/sweep_retrain.py [sf_dir]
"""

import os
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from spark_alchemy_spark.operators.similarity import (  # noqa: E402
    append_ivf_index,
    build_ivf_index,
    retrain_ivf_index,
)
from spark_alchemy_spark.session import build_session  # noqa: E402

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"

spark = build_session(
    "retrain-sweep",
    extra_conf={
        "spark.ui.enabled": "false",
        "spark.ui.showConsoleProgress": "false",
    },
)
spark.sparkContext.setLogLevel("ERROR")


def corpus(n, dim=32, sign=1.0, base=0):
    return spark.range(base, base + n).select(
        F.col("id").alias("vec_id"),
        F.transform(
            F.sequence(F.lit(0), F.lit(dim - 1)),
            lambda i: sign * (1.0 + F.cos(i * (1.0 + F.col("id") % 13))),
        ).alias("embedding"),
    )


BATCH = 2_000  # fixed drifted batch across all index sizes
print(f"{'index_rows':>10} {'append_s':>9} {'retrain_s':>10}")
for n in (10_000, 40_000, 160_000):
    path = os.path.join(tempfile.gettempdir(), f"rt_sweep_{n}")
    import shutil

    shutil.rmtree(path, ignore_errors=True)
    build_ivf_index(corpus(n), "vec_id", "embedding", path, n_centroids=16)
    drifted = corpus(BATCH, sign=-1.0, base=10_000_000)
    t0 = time.time()
    rep = append_ivf_index(drifted, "vec_id", "embedding", path)
    t_append = time.time() - t0
    assert rep["retrain_recommended"] is True
    t0 = time.time()
    rt = retrain_ivf_index(spark, path, id_col="vec_id")
    t_retrain = time.time() - t0
    assert rt["n"] == n + BATCH
    print(f"{n:>10} {t_append:>9.2f} {t_retrain:>10.2f}")
