"""BPE training-loop tests: the distributed trainer vs a sequential
Python reference replay of the classic algorithm, plus the
non-overlapping merge rule and determinism edge cases."""

from __future__ import annotations

from collections import Counter

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F


def _reference_bpe(word_freqs: dict[str, int], n_merges: int):
    """Sequential textbook BPE on a word-frequency table: best pair by
    (count desc, left, right), leftmost non-overlapping application."""
    state = {w: [list(w), f] for w, f in word_freqs.items()}
    merges = []
    for step in range(1, n_merges + 1):
        counts: Counter = Counter()
        for syms, f in state.values():
            for a, b in zip(syms, syms[1:]):
                counts[(a, b)] += f
        if not counts:
            break
        (left, right), n = min(
            counts.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        merges.append((step, left, right, n))
        for entry in state.values():
            syms = entry[0]
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == left and syms[i + 1] == right:
                    out.append(left + right)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            entry[0] = out
    return merges


def _reference_encode(word, merges):
    """Sequential leftmost-non-overlapping replay of an ordered merges
    list over one word; returns the final symbol list."""
    syms = list(word)
    for m in merges:
        left, right = m[1], m[2]
        out, i = [], 0
        while i < len(syms):
            if i + 1 < len(syms) and syms[i] == left and syms[i + 1] == right:
                out.append(left + right)
                i += 2
            else:
                out.append(syms[i])
                i += 1
        syms = out
    return syms


def _train(spark, word_freqs: dict[str, int], n_merges: int):
    from spark_alchemy_spark.operators.bpe import train_bpe_merges

    df = spark.createDataFrame(
        [Row(w=w, freq=f) for w, f in word_freqs.items()]
    )
    return [
        (r["step"], r["lhs"], r["rhs"], r["n"])
        for r in train_bpe_merges(df, n_merges).orderBy("step").collect()
    ]


def test_bpe_matches_reference_on_classic_corpus(spark):
    """The canonical BPE teaching corpus (Sennrich-style): the
    distributed trainer must replay the sequential reference exactly,
    merges and counts both."""
    corpus = {"low": 5, "lower": 2, "newest": 6, "widest": 3}
    assert _train(spark, corpus, 6) == _reference_bpe(corpus, 6)


def test_bpe_nonoverlapping_merge_rule(spark):
    """'aaaa' under merge (a, a) must become [aa, aa] and 'aaa' must
    become [aa, a] — leftmost non-overlapping, never re-matching the
    just-merged right symbol."""
    corpus = {"aaaa": 3, "aaa": 2, "ab": 1}
    got = _train(spark, corpus, 2)
    ref = _reference_bpe(corpus, 2)
    assert got == ref
    # step 1 pairs: (a,a) count 3*3 + 2*2 = 13
    assert got[0] == (1, "a", "a", 13)
    # after merge: aaaa->[aa,aa], aaa->[aa,a]; step 2 best is (aa,aa)=3
    assert got[1] == (2, "aa", "aa", 3)


def test_bpe_stops_when_pairs_exhausted(spark):
    """Single-char vocab has no adjacent pairs: the loop stops early
    and returns an empty merges table with the right schema."""
    got = _train(spark, {"a": 5, "b": 3}, 4)
    assert got == []


def test_bpe_tiebreak_is_lexicographic(spark):
    """Equal counts break by (lhs, rhs) ascending, deterministically."""
    corpus = {"zy": 2, "ab": 2}
    got = _train(spark, corpus, 1)
    assert got == [(1, "a", "b", 2)]


def test_bpe_words_filters_non_alpha(spark):
    from spark_alchemy_spark.operators.bpe import bpe_words

    docs = spark.createDataFrame(
        [Row(text="Hello world hello  WORLD 42 a-b (x)")]
    )
    got = {r["w"]: r["freq"] for r in bpe_words(docs).collect()}
    assert got == {"hello": 2, "world": 2}


@pytest.mark.parametrize("checkpoint_every", [1, 2])
def test_bpe_checkpoint_cadence_does_not_change_output(
    spark, checkpoint_every
):
    from spark_alchemy_spark.operators.bpe import train_bpe_merges

    corpus = {"banana": 4, "bandana": 2, "cabana": 3}
    df = spark.createDataFrame([Row(w=w, freq=f) for w, f in corpus.items()])
    got = [
        tuple(r)
        for r in train_bpe_merges(
            df, 5, checkpoint_every=checkpoint_every
        ).orderBy("step").collect()
    ]
    assert got == [
        (s, l, r, n) for s, l, r, n in _reference_bpe(corpus, 5)
    ]


def test_encode_with_merges_matches_reference(spark):
    """encode_with_merges must yield each word's reference-encoded
    symbol count after applying the trained merges in order."""
    from spark_alchemy_spark.operators.bpe import (
        encode_with_merges,
        train_bpe_merges,
    )

    corpus = {"low": 5, "lower": 2, "newest": 6, "widest": 3, "a": 1}
    df = spark.createDataFrame([Row(w=w, freq=f) for w, f in corpus.items()])
    merges = [tuple(r) for r in train_bpe_merges(df, 6).orderBy("step").collect()]

    got = {
        r["w"]: r["n_subtokens"]
        for r in encode_with_merges(df, merges).collect()
    }
    assert got == {w: len(_reference_encode(w, merges)) for w in corpus}
    assert got["a"] == 1  # single-char word survives every fold


def test_encode_oracle_survives_merge_exhaustion(spark, tmp_path):
    """When the corpus runs out of adjacent pairs before _BPE_N_MERGES
    rounds, the oracle's later word-state CTEs must pass through
    unchanged (LEFT JOIN ON TRUE), not collapse to zero rows — and the
    Spark entry must agree with the oracle on such a corpus."""
    import duckdb

    from spark_alchemy_spark.queries_r5 import (
        _BPE_N_MERGES,
        _bpe_rounds_ctes,
    )

    # 'ab' admits exactly ONE merge (a,b); rounds 2..8 find no pairs
    docs = spark.createDataFrame(
        [(1, "en", "ab ab x9"), (2, "de", "ab b a")],
        "doc_id long, lang string, text string",
    )
    pq = str(tmp_path / "docs.parquet")
    docs.coalesce(1).write.mode("overwrite").parquet(pq)

    oracle = (
        _bpe_rounds_ctes(_BPE_N_MERGES)
        + f""",
    enc AS (SELECT w, len(string_split(st[2:len(st)-1], ')(')) AS nsub
            FROM s{_BPE_N_MERGES})
    SELECT w, nsub FROM enc ORDER BY w
    """
    )
    con = duckdb.connect()
    con.sql(f"CREATE VIEW documents AS SELECT * FROM '{pq}/*.parquet'")
    got = con.sql(oracle).fetchall()
    # 'ab' -> [ab] (1), 'a' -> [a] (1), 'b' -> [b] (1); 'x9' filtered
    assert got == [("a", 1), ("ab", 1), ("b", 1)]

    from spark_alchemy_spark.operators.bpe import (
        bpe_words,
        encode_with_merges,
        train_bpe_merges,
    )

    words = bpe_words(docs)
    merges = [
        tuple(r)
        for r in train_bpe_merges(words, _BPE_N_MERGES).orderBy("step").collect()
    ]
    assert len(merges) == 1  # early stop after the single merge
    spark_side = {
        (r["w"], r["n_subtokens"])
        for r in encode_with_merges(words, merges).collect()
    }
    assert spark_side == set(got)


def test_encode_with_merges_rejects_bad_shapes(spark):
    from pyspark.sql import Row

    from spark_alchemy_spark.operators.bpe import encode_with_merges

    df = spark.createDataFrame([Row(w="ab", freq=1)])
    with pytest.raises(ValueError, match="expected"):
        encode_with_merges(df, [(1, "a", "b")])  # 3-field tuple
    with pytest.raises(ValueError, match="must be strings"):
        encode_with_merges(df, [(1, 2)])


from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_hsettings = settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


@_hsettings
@given(
    corpus=st.dictionaries(
        st.text(alphabet="abc", min_size=1, max_size=6),
        st.integers(min_value=1, max_value=9),
        min_size=1,
        max_size=8,
    ),
    n_merges=st.integers(min_value=1, max_value=5),
)
def test_bpe_property_matches_reference(spark, corpus, n_merges):
    """Property law: on ANY word-frequency table the distributed
    trainer replays the sequential reference exactly — merges, counts,
    tie-breaks, early stop — and the encoded lengths match the
    reference replay.  A 3-letter alphabet with repeats forces heavy
    pair ties and overlap (aaa/abab), the hard cases for the
    leftmost-non-overlapping rule."""
    from pyspark.sql import Row

    from spark_alchemy_spark.operators.bpe import (
        encode_with_merges,
        train_bpe_merges,
    )

    df = spark.createDataFrame([Row(w=w, freq=f) for w, f in corpus.items()])
    got = [
        tuple(r) for r in train_bpe_merges(df, n_merges).orderBy("step").collect()
    ]
    ref = _reference_bpe(corpus, n_merges)
    assert got == ref

    enc = {
        r["w"]: r["n_subtokens"]
        for r in encode_with_merges(df, got).collect()
    }
    assert enc == {w: len(_reference_encode(w, ref)) for w in corpus}


def test_vocab_table_ids_and_occurrences(spark):
    """Vocabulary artifact law: base symbols get alphabetical ids,
    merged symbols continue in merge order, and occurrence counts are
    the frequency-weighted symbol counts of the fully encoded corpus."""
    from pyspark.sql import Row

    from spark_alchemy_spark.operators.bpe import (
        encode_with_merges,
        train_bpe_merges,
    )

    corpus = {"low": 5, "lowest": 2}
    df = spark.createDataFrame([Row(w=w, freq=f) for w, f in corpus.items()])
    merges = [
        tuple(r) for r in train_bpe_merges(df, 2).orderBy("step").collect()
    ]
    enc = encode_with_merges(df, merges, keep_syms=True)
    rows = {r["w"]: r["syms"] for r in enc.collect()}
    ref = {w: _reference_encode(w, merges) for w in corpus}
    assert rows == ref
    # weighted occurrence counts match a hand count
    occ = {}
    for w, syms in ref.items():
        for s in syms:
            occ[s] = occ.get(s, 0) + corpus[w]
    got_occ = {}
    for r in (
        enc.select("freq", "syms").collect()
    ):
        for s in r["syms"]:
            got_occ[s] = got_occ.get(s, 0) + r["freq"]
    assert got_occ == occ


def test_bpe_vocab_entry_id_convention(spark):
    """The vocab entry's id convention, pinned independently of the
    oracle: base symbols get alphabetical ids 0..B-1, merged symbols
    continue B, B+1, ... in merge order, and every occurrence count is
    non-negative with the top base symbols actually occurring."""
    from spark_alchemy_spark.queries import QUERIES
    from spark_alchemy_spark.queries_r5 import _trained_merges

    sf = "/root/testdata/sf0.001"
    rows = QUERIES["bpe_vocab_table"](spark, sf).collect()
    base = sorted(
        (r["token_id"], r["symbol"]) for r in rows if r["kind"] == "base"
    )
    merged = sorted(
        (r["token_id"], r["symbol"]) for r in rows if r["kind"] == "merged"
    )
    # base: contiguous ids from 0, symbols in alphabetical order
    assert [i for i, _ in base] == list(range(len(base)))
    assert [sym for _, sym in base] == sorted(sym for _, sym in base)
    # merged: continue after base, in merge order, symbol = lhs+rhs
    _, merges = _trained_merges(spark, sf)
    assert [i for i, _ in merged] == [
        len(base) + step - 1 for step, _, _, _ in merges
    ]
    assert [sym for _, sym in merged] == [l + r for _, l, r, _ in merges]
    assert all(r["corpus_occ"] >= 0 for r in rows)
