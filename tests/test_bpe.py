"""BPE training-loop tests: the distributed byte-level trainer vs a
sequential Python reference replay of the classic algorithm, the
non-overlapping merge rule, determinism edge cases, and the
cross-encoder law (Catalyst fold chain == vocab-scale merge-rank
encoder == sequential reference) including a 256-merge run the fold
chain could never plan."""

from __future__ import annotations

from collections import Counter

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F


def _hx(w: str) -> list[str]:
    """A word's base symbols: uppercase hex pairs of its UTF-8 bytes —
    the byte-level representation the trainer/encoder/oracle share."""
    h = w.encode("utf-8").hex().upper()
    return [h[i : i + 2] for i in range(0, len(h), 2)]


def _reference_bpe(word_freqs: dict[str, int], n_merges: int):
    """Sequential textbook BPE on a word-frequency table: best pair by
    (count desc, left, right), leftmost non-overlapping application,
    over hex byte symbols."""
    state = {w: [_hx(w), f] for w, f in word_freqs.items()}
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
    list over one word's hex byte symbols; returns the final symbol
    list."""
    syms = _hx(word)
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


def test_bpe_handles_punctuation_digits_and_utf8(spark):
    """Byte-level means EVERY input has a symbol sequence: punctuation
    runs, digit runs, and multi-byte UTF-8 (each byte a base symbol)
    train exactly like letters."""
    corpus = {"-1.0": 4, "#42!": 3, "naïve": 2, "::": 5}
    got = _train(spark, corpus, 5)
    assert got == _reference_bpe(corpus, 5)
    # '::' is ('3A','3A') x5 — the strongest pair on this corpus
    assert got[0][1:3] == ("3A", "3A")


def test_bpe_nonoverlapping_merge_rule(spark):
    """'aaaa' under merge (a, a) must become [aa, aa] and 'aaa' must
    become [aa, a] — leftmost non-overlapping, never re-matching the
    just-merged right symbol."""
    corpus = {"aaaa": 3, "aaa": 2, "ab": 1}
    got = _train(spark, corpus, 2)
    ref = _reference_bpe(corpus, 2)
    assert got == ref
    # step 1 pairs: (61,61) count 3*3 + 2*2 = 13
    assert got[0] == (1, "61", "61", 13)
    # after merge: aaaa->[6161,6161], aaa->[6161,61]; step 2 best is
    # (6161,6161)=3
    assert got[1] == (2, "6161", "6161", 3)


def test_bpe_stops_when_pairs_exhausted(spark):
    """Single-byte vocab has no adjacent pairs: the loop stops early
    and returns an empty merges table with the right schema."""
    got = _train(spark, {"a": 5, "b": 3}, 4)
    assert got == []


def test_bpe_tiebreak_is_lexicographic(spark):
    """Equal counts break by (lhs, rhs) ascending, deterministically
    — over hex symbols, so byte order."""
    corpus = {"zy": 2, "ab": 2}
    got = _train(spark, corpus, 1)
    assert got == [(1, "61", "62", 2)]


def test_pre_tokenize_class_splitting(spark):
    """GPT-2-style pre-tokenization: letter runs, digit runs, and
    punctuation runs are separate words; case folds; whitespace of any
    kind separates.  Nothing is dropped — the byte-level universe has
    no out-of-vocabulary input."""
    from spark_alchemy_spark.operators.bpe import bpe_words

    docs = spark.createDataFrame(
        [Row(text="Hello world hello  WORLD 42 a-b (x)\tnew\nline")]
    )
    got = {r["w"]: r["freq"] for r in bpe_words(docs).collect()}
    assert got == {
        "hello": 2, "world": 2, "42": 1, "a": 1, "-": 1, "b": 1,
        "(": 1, "x": 1, ")": 1, "new": 1, "line": 1,
    }


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
    assert got["a"] == 1  # single-byte word survives every fold


def test_encode_with_merge_ranks_matches_fold_encoder(spark):
    """Cross-encoder law: the vocab-scale merge-rank encoder must
    produce the SAME symbol arrays as the Catalyst fold chain and the
    sequential reference — including punctuation/digit words."""
    from spark_alchemy_spark.operators.bpe import (
        encode_with_merge_ranks,
        encode_with_merges,
        train_bpe_merges,
    )

    corpus = {"low": 5, "lower": 2, "newest": 6, "-1.0": 4, "#42!": 3}
    df = spark.createDataFrame([Row(w=w, freq=f) for w, f in corpus.items()])
    merges = [tuple(r) for r in train_bpe_merges(df, 6).orderBy("step").collect()]

    fold = {
        r["w"]: r["syms"]
        for r in encode_with_merges(df, merges, keep_syms=True).collect()
    }
    rank = {
        r["w"]: r["syms"]
        for r in encode_with_merge_ranks(df, merges, keep_syms=True).collect()
    }
    ref = {w: _reference_encode(w, merges) for w in corpus}
    assert rank == fold == ref


def test_encode_with_merge_ranks_256_merges(spark):
    """The vocab-scale contract: 256 trained merges — 16x past the
    fold chain's documented ~8-merge plan ceiling — applied in ONE
    Arrow pass, bit-equal to the sequential reference replay on every
    word.  Merges are trained by the (fast) Python reference trainer;
    the Spark side under test is the encoder."""
    import random

    from spark_alchemy_spark.operators.bpe import encode_with_merge_ranks

    rng = random.Random(42)
    alphabet = "abcdefghijkl"
    corpus = {
        "".join(rng.choice(alphabet) for _ in range(rng.randint(3, 12))): rng.randint(1, 50)
        for _ in range(600)
    }
    merges = _reference_bpe(corpus, 256)
    assert len(merges) >= 256  # the corpus actually admits 256 rounds

    df = spark.createDataFrame([Row(w=w, freq=f) for w, f in corpus.items()])
    got = {
        r["w"]: r["syms"]
        for r in encode_with_merge_ranks(df, merges, keep_syms=True).collect()
    }
    assert got == {w: _reference_encode(w, merges) for w in corpus}


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

    # 'ab' admits exactly ONE merge (61,62); rounds 2..8 find no pairs
    # ('x9' pre-tokenizes into the single-byte words 'x' and '9')
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
    # 'ab' -> [6162] (1); 'a','b','x','9' single-byte (1 each)
    assert got == [("9", 1), ("a", 1), ("ab", 1), ("b", 1), ("x", 1)]

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
    assert merges == [(1, "61", "62", 3)]  # early stop after one merge
    spark_side = {
        (r["w"], r["n_subtokens"])
        for r in encode_with_merges(words, merges).collect()
    }
    assert spark_side == set(got)


def test_encoders_reject_bad_merge_shapes(spark):
    from pyspark.sql import Row

    from spark_alchemy_spark.operators.bpe import (
        encode_with_merge_ranks,
        encode_with_merges,
    )

    df = spark.createDataFrame([Row(w="ab", freq=1)])
    for enc in (encode_with_merges, encode_with_merge_ranks):
        with pytest.raises(ValueError, match="expected"):
            enc(df, [(1, "a", "b")])  # 3-field tuple
        with pytest.raises(ValueError, match="must be strings"):
            enc(df, [(1, 2)])


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
    tie-breaks, early stop — and BOTH encoders match the reference
    replay.  A 3-letter alphabet with repeats forces heavy pair ties
    and overlap (aaa/abab), the hard cases for the
    leftmost-non-overlapping rule and for the rank encoder's
    monotonic-rank equivalence to sequential order."""
    from pyspark.sql import Row

    from spark_alchemy_spark.operators.bpe import (
        encode_with_merge_ranks,
        encode_with_merges,
        train_bpe_merges,
    )

    df = spark.createDataFrame([Row(w=w, freq=f) for w, f in corpus.items()])
    got = [
        tuple(r) for r in train_bpe_merges(df, n_merges).orderBy("step").collect()
    ]
    ref = _reference_bpe(corpus, n_merges)
    assert got == ref

    want = {w: len(_reference_encode(w, ref)) for w in corpus}
    enc_fold = {
        r["w"]: r["n_subtokens"]
        for r in encode_with_merges(df, got).collect()
    }
    enc_rank = {
        r["w"]: r["n_subtokens"]
        for r in encode_with_merge_ranks(df, got).collect()
    }
    assert enc_fold == want
    assert enc_rank == want


def test_vocab_table_ids_and_occurrences(spark):
    """Vocabulary artifact law: base symbols get byte-order ids,
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
    oracle: base symbols get byte-order ids 0..B-1, merged symbols
    continue B, B+1, ... in merge order, and every occurrence count is
    non-negative."""
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
    # base: contiguous ids from 0, symbols in byte order
    assert [i for i, _ in base] == list(range(len(base)))
    assert [sym for _, sym in base] == sorted(sym for _, sym in base)
    # merged: continue after base, in merge order, symbol = lhs+rhs
    _, merges = _trained_merges(spark, sf)
    assert [i for i, _ in merged] == [
        len(base) + step - 1 for step, _, _, _ in merges
    ]
    assert [sym for _, sym in merged] == [l + r for _, l, r, _ in merges]
    assert all(r["corpus_occ"] >= 0 for r in rows)
