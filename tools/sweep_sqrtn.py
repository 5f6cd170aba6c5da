"""sqrt(n)-centroid selective semantic dedup sweep (VERDICT r6 task 1).

Per tier: plant duplicates (every 20th vector -> identical copy at
+10M and a 1.001x-scaled copy at +20M, the battery entry's
construction), run semantic_dup_pairs with n_centroids=None (the
sqrt(n) production default), nprobe=2, threshold=0.95. Warm second
run timed; recall measured on both plant families.
"""
import sys, time
sys.path.insert(0, "/root/repo")
from pyspark.sql import functions as F
from spark_alchemy_spark.session import build_session
from spark_alchemy_spark.operators.dedup import _as_double, semantic_dup_pairs

spark = build_session("sqrtn-sweep", extra_conf={
    "spark.ui.enabled": "false", "spark.ui.showConsoleProgress": "false",
    "spark.driver.memory": "10g"})
spark.sparkContext.setLogLevel("ERROR")

A, B = 10_000_000, 20_000_000

def tier(name, path):
    emb = spark.read.parquet(path + "/embeddings.parquet")
    vecs = emb.select("vec_id", _as_double("embedding").alias("embedding"))
    base = vecs.filter(
        (F.col("vec_id") % 20 == 0) & F.exists("embedding", lambda x: x != 0)
    ).localCheckpoint(eager=False)
    pa = base.select((F.col("vec_id") + F.lit(A)).alias("vec_id"), "embedding")
    pb = base.select((F.col("vec_id") + F.lit(B)).alias("vec_id"),
                     F.transform("embedding", lambda x: x * 1.001).alias("embedding"))
    corpus = vecs.unionByName(pa).unionByName(pb).localCheckpoint(eager=False)
    n = corpus.count()
    n_base = base.count()
    import math
    k = max(2, int(round(n ** 0.5)))
    times = []
    for rep in range(2):
        t0 = time.time()
        pairs = semantic_dup_pairs(corpus, "vec_id", "embedding",
                                   threshold=0.95, n_centroids=None, nprobe=2,
                                   seed=42)
        pairs.write.format("noop").mode("overwrite").save()
        times.append(time.time() - t0)
    # recall on the planted families (pairs recomputed once more, cheap vs timing)
    pairs = semantic_dup_pairs(corpus, "vec_id", "embedding",
                               threshold=0.95, n_centroids=None, nprobe=2, seed=42)
    planted = pairs.filter(
        (F.col("id_a") < A) & (F.col("id_a") % 20 == 0)
        & (F.col("id_b") - F.col("id_a")).isin(A, B))
    c = planted.agg(
        F.sum(((F.col("id_b") - F.col("id_a")) == A).cast("long")).alias("a"),
        F.sum(((F.col("id_b") - F.col("id_a")) == B).cast("long")).alias("b"),
    ).collect()[0]
    na, nb = int(c["a"] or 0), int(c["b"] or 0)
    print(f"{name}: n={n} n_centroids={k} cold={times[0]:.2f}s warm={times[1]:.2f}s "
          f"exact_recall={na}/{n_base}={na*100.0/n_base:.1f}% "
          f"scaled_recall={nb}/{n_base}={nb*100.0/n_base:.1f}%", flush=True)

tier("sf0.01", "/root/testdata/sf0.01")
tier("sf0.1", "/root/testdata/sf0.1")
tier("synth0.5", "/tmp/synth0.5")
