"""Curation pipeline unit tests: stage semantics on a hand-built corpus."""

from __future__ import annotations

from spark_alchemy_spark.operators.curate import _pair_losers, curate_corpus

GOOD = "the quick brown fox jumps over the lazy dog and then runs far away to the old barn again tonight with joy"  # 21 tokens, en


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_quality_and_exact_dedup(spark):
    docs = _docs(
        spark,
        [
            (1, GOOD),
            (2, "too short"),  # quality-dropped
            (3, GOOD),  # exact duplicate of 1 -> dropped (min id wins)
            (4, GOOD + " extra"),  # different fingerprint -> survives
        ],
    )
    out = curate_corpus(docs, near_dup_threshold=None).orderBy("doc_id").collect()
    assert [r["doc_id"] for r in out] == [1, 4]
    assert out[0]["lang_pred"] == "en"
    assert out[0]["n_tokens"] == len(GOOD.split())


def test_near_dedup_drops_component_non_minima(spark):
    base = GOOD + " alpha beta gamma delta epsilon zeta eta theta iota kappa"
    variant = base.replace("joy", "glee")  # high-Jaccard near-dup
    other = (
        "sailing boats drift across calm blue water while gulls circle high "
        "above the harbor and fishermen mend their nets beside wooden docks "
        "every single morning before sunrise arrives"
    )
    docs = _docs(spark, [(1, base), (2, variant), (3, other)])
    out = curate_corpus(docs, near_dup_threshold=0.5).orderBy("doc_id").collect()
    ids = [r["doc_id"] for r in out]
    assert 1 in ids and 2 not in ids  # 2 lost to 1
    assert 3 in ids


def test_pair_losers_union_find(spark):
    pairs = spark.createDataFrame(
        [(1, 2), (2, 5), (7, 9), (3, 4)], "id_a long, id_b long"
    )
    assert _pair_losers(pairs) == {2, 5, 9, 4}
