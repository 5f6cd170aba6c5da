"""synth1.0 core-scaling spot-check (VERDICT r10 item 7 / r11).

At sf0.1 the heavy battery entries are driver/job-count-bound, so the
driver's 8-vs-32-core ratio can no longer SEE data-path parallelism.
This sweep restores that signal for the r10/r11 kernel paths at one
scale up: a deterministic 10x replication of sf0.1 (synth1.0 —
sf1-sized fact volume: 50k documents, 20k embeddings, 50k synthetic
64-bit fingerprints) driven straight through the OPERATORS (noop sink,
warm second run) at a given core count.

Replicas are decorrelated so pair volume stays linear: every word of
replica r carries a '#r' suffix (no cross-replica shingle overlap) and
every embedding is circularly rotated by r positions (directions
decorrelate, planted structure within each replica preserved).

Usage: python tools/sweep_cores_synth1.py <cores>
Run once with 32 and once with 8; record warm seconds + the ratio in
SCALING.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SYNTH = "/tmp/synth1.0"
REPLICAS = 10


def generate(spark):
    from pyspark.sql import functions as F

    docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    emb = spark.read.parquet("/root/testdata/sf0.1/embeddings.parquet")
    reps = spark.range(REPLICAS).withColumnRenamed("id", "__r")
    d10 = (
        docs.crossJoin(reps)
        .select(
            (F.col("doc_id") + F.col("__r") * 1_000_000).alias("doc_id"),
            F.expr(
                "array_join(transform(split(text, ' '), "
                "w -> concat(w, '#', CAST(__r AS STRING))), ' ')"
            ).alias("text"),
            "lang",
        )
    )
    d10.write.mode("overwrite").parquet(SYNTH + "/documents.parquet")
    e10 = (
        emb.crossJoin(reps)
        .select(
            (F.col("vec_id") + F.col("__r") * 1_000_000).alias("vec_id"),
            F.expr(
                "transform(sequence(0, size(embedding) - 1), "
                "i -> element_at(embedding, "
                "CAST((i + __r) % size(embedding) AS INT) + 1))"
            ).alias("embedding"),
        )
    )
    e10.write.mode("overwrite").parquet(SYNTH + "/embeddings.parquet")
    # synthetic 64-bit '0'/'1' fingerprints, one per replicated doc id
    spark.range(50_000).select(
        F.col("id").alias("fp_id"),
        F.lpad(F.bin(F.xxhash64(F.lit(7), "id")), 64, "0").alias("bits"),
    ).write.mode("overwrite").parquet(SYNTH + "/bitstrings.parquet")


def main():
    cores = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    from spark_alchemy_spark.session import build_session

    spark = build_session(
        f"synth1-cores{cores}",
        master=f"local[{cores}]",
        extra_conf={
            "spark.ui.enabled": "false",
            "spark.ui.showConsoleProgress": "false",
            "spark.driver.memory": "12g",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    if not os.path.isdir(SYNTH + "/bitstrings.parquet"):
        generate(spark)

    from pyspark.sql import functions as F

    from spark_alchemy_spark.operators.dedup import (
        bitstring_hamming_pairs,
        minhash_lsh_pairs,
        ngram_jaccard_pairs,
        semantic_dup_pairs,
        simhash_pairs,
    )
    from spark_alchemy_spark.operators.similarity import brute_force_topk

    docs = spark.read.parquet(SYNTH + "/documents.parquet")
    emb = spark.read.parquet(SYNTH + "/embeddings.parquet")
    bits = spark.read.parquet(SYNTH + "/bitstrings.parquet")
    queries = emb.filter(F.col("vec_id") < 64)

    kernels = {
        "ngram_jaccard_pairs": lambda: ngram_jaccard_pairs(
            docs, "doc_id", "text", n=3, threshold_num=6, threshold_den=10,
            max_shingle_df=None,
        ),
        "minhash_lsh_pairs": lambda: minhash_lsh_pairs(
            docs, "doc_id", "text", n=3, num_perm=64, bands=16, threshold=0.5
        ),
        "simhash_pairs": lambda: simhash_pairs(
            docs, "doc_id", "text", max_hamming=8
        ),
        "brute_force_topk": lambda: brute_force_topk(
            emb, queries, "vec_id", "embedding", k=10
        ),
        "semantic_dup_pairs": lambda: semantic_dup_pairs(
            emb, "vec_id", "embedding", threshold=0.95, n_centroids=None,
            nprobe=2, seed=42,
        ),
        "bitstring_hamming_pairs": lambda: bitstring_hamming_pairs(
            bits, "fp_id", "bits", max_hamming=3, n_bits=64, n_bands=4
        ),
    }
    out = {"cores": cores}
    for name, mk in kernels.items():
        walls = []
        for _ in range(2):
            t0 = time.time()
            mk().write.format("noop").mode("overwrite").save()
            walls.append(round(time.time() - t0, 2))
        out[name] = walls[1]  # warm
        print(f"{name} cores={cores}: cold={walls[0]} warm={walls[1]}", flush=True)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
