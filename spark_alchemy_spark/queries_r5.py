"""Battery extension, round 5 (upgraded in round 6): the tokenizer
tier end to end, semantic dedup, and plan-level additions flagged by
the round-4 review.

Round 6 (VERDICT r5 tasks 1-2): the whole BPE tier is now BYTE-LEVEL —
GPT-2-style class-splitting pre-tokenization (letters/digits/punct
runs, ``operators.bpe.PRE_TOKEN_RE``) with per-UTF-8-byte hex symbols,
oracle-replayed through an escape-safe hex encoding; encoding runs
through the vocab-scale merge-rank encoder (one Arrow pass over the
distinct-word table, cost independent of merge count); and the
``*_punct`` entries gate the tier over a deterministically punctuated
corpus derivative (the driver testdata is pure ``[a-z ]``).

* ``bpe_train_merges`` — the FULL BPE training loop (not just one
  candidate count): N rounds of pair-count -> argmax -> merge-apply
  over the distinct-word table, producing the ordered merges table a
  tokenizer ships (``operators/bpe.py``).  The oracle replays the same
  N rounds non-recursively: per round, one GROUP BY picks the best
  pair and one string ``replace`` over parenthesis-wrapped symbol
  strings applies it (leftmost non-overlapping — exactly the BPE
  rule), unrolled by a Python generator the same way the
  connected-components oracle unrolls label propagation.
* ``bpe_encode_corpus`` — the trained merges APPLIED: per-word folds
  over the vocab only, joined back onto the corpus word stream for
  per-lang subtoken accounting (integer-ppm compression).
* ``prep_pack_bpe_budget`` — the trainer's layout job composed:
  training -> encoding -> per-doc subtoken counts -> contiguous
  packing into 512-SUBTOKEN sequences across shards.
* ``dedup_semantic_clusters`` — SemDeDup-style semantic dedup:
  k-means/IVF clusters over embeddings (reusing the trained-centroid
  path from ``operators/similarity.py``), then WITHIN-cluster
  candidate pruning by exact cosine; probe-all reduces exactly to
  brute force and is held to an all-pairs + unrolled-CC oracle.
* ``plan_cms_join_choice`` — sketch-guided join strategy selection on
  real tables, planned strategy asserted inside the entry.

The train/encode/pack entries share one training run per session
(``_trained_merges``).  Same determinism conventions as queries.py.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from .localframe import local_frame

from .operators.bpe import PRE_TOKEN_RE
from .queries import _t, query
from .queries_scale import _cc_close_sql

# ---------------------------------------------------------------------------
# BPE training loop
# ---------------------------------------------------------------------------

_BPE_N_MERGES = 8


def _bpe_rounds_ctes(n_merges: int, text_sql: str = "text") -> str:
    """Unrolled non-recursive replay of the byte-level BPE training
    loop, through CTEs ``m1..mN`` (per-round best pair) and
    ``s0..sN`` (per-round word states; the word rides every state so
    encode-style consumers can map word -> final symbol count).

    Pre-tokenization is the shared class-splitting rule
    (``operators.bpe.PRE_TOKEN_RE`` — letter / digit / punctuation
    runs, identical in RE2 and Java regex).  Word state is the
    parenthesis-wrapped HEX-SYMBOL string ``(68)(65)(6C)(6C)(6F)``
    (per-UTF-8-byte, uppercase — DuckDB's ``hex()`` matches Spark's
    bit-for-bit): adjacent-pair counting splits it back to a symbol
    list, and applying merge (l, r) is one string
    ``replace('(l)(r)' -> '(lr)')`` — SQL replace scans left to right
    without overlap, which IS the BPE merge rule (the wrapping makes
    occurrences share no characters, so "(61)(61)(61)" under merge
    (61,61) correctly yields "(6161)(61)").  Hex symbols are
    ``[0-9A-F]+``, so the ``(`` ``)`` ``|`` delimiters can never
    collide with symbol content — this is what lets the byte-level
    trainer cover punctuation in the corpus itself.

    ``text_sql`` is the corpus text expression (over ``documents``
    columns) — the punctuated-derivative entries pass a transformed
    expression here and the Spark side applies the same transform."""
    steps = []
    for k in range(1, n_merges + 1):
        steps.append(
            f"""
    m{k} AS MATERIALIZED (
      SELECT l, r, n FROM (
        SELECT string_split(pr, '|')[1] AS l, string_split(pr, '|')[2] AS r,
               CAST(sum(freq) AS BIGINT) AS n
        FROM (
          SELECT unnest([syms[i] || '|' || syms[i+1]
                         FOR i IN range(1, len(syms))]) AS pr, freq
          FROM (SELECT freq, string_split(st[2:len(st)-1], ')(') AS syms
                FROM s{k - 1})
        ) GROUP BY 1, 2
      ) ORDER BY n DESC, l, r LIMIT 1),
    s{k} AS MATERIALIZED (
      -- LEFT JOIN ON TRUE, not a cross join: when the corpus runs out
      -- of adjacent pairs before round {k}, m{k} is EMPTY and a cross
      -- join would empty every later word state (breaking the encode/
      -- pack consumers of s_N); with no merge the state passes through
      SELECT w, freq,
             CASE WHEN m.l IS NULL THEN st
                  ELSE replace(st, '(' || m.l || ')(' || m.r || ')',
                               '(' || m.l || m.r || ')') END AS st
      FROM s{k - 1} LEFT JOIN m{k} m ON TRUE),"""
        )
    return (
        f"""
    WITH w0 AS MATERIALIZED (
      SELECT w, count(*) AS freq FROM (
        SELECT unnest(regexp_extract_all(lower({text_sql}),
                                         '{PRE_TOKEN_RE}')) AS w
        FROM documents)
      GROUP BY w),
    s0 AS MATERIALIZED (
      SELECT w, freq,
             '(' || array_to_string(
                      [substr(hex(w), i*2-1, 2)
                       FOR i IN range(1, len(hex(w))//2 + 1)],
                      ')(') || ')' AS st
      FROM w0),"""
        + "".join(steps)[:-1]
    )


#: Deterministic punctuated-derivative corpus (VERDICT r5 task 1 "done"
#: check: the byte-level trainer must be green over a slice containing
#: punctuation and digits — the driver testdata is pure [a-z ], so the
#: punct entries derive one, with the SAME transform on both sides):
#: a '+-' punctuation run and a '19' digit run between every word pair
#: plus a ' #<doc_id%97>!' suffix.  The inter-word runs are as frequent
#: as the words themselves, so the ('2B','2D') and ('31','39') byte
#: pairs WIN early merges — the trained table visibly contains
#: punctuation and digit merges, not just letters (a transform whose
#: punct stayed out of the top-8 would gate nothing).
_PUNCT_TEXT_SQL = (
    "replace(text, ' ', ' +-19 ') || ' #' || "
    "CAST(doc_id % 97 AS VARCHAR) || '!'"
)


def _punct_documents(documents):
    """The Spark twin of ``_PUNCT_TEXT_SQL``, applied to the documents
    table's text column."""
    return documents.withColumn(
        "text",
        F.concat(
            F.expr("replace(text, ' ', ' +-19 ')"),
            F.lit(" #"),
            (F.col("doc_id") % 97).cast("string"),
            F.lit("!"),
        ),
    )


_BPE_CACHE: dict = {}


def _trained_merges(spark, sf_dir, corpus: str = "plain"):
    """(checkpointed words DF, ordered merges list), cached per
    (session, sf dir, corpus tag): every BPE entry shares ONE training
    run per corpus (same pattern as the exact-pair reference cache in
    queries.py).  ``corpus='punct'`` trains over the deterministic
    punctuated derivative (``_punct_documents``)."""
    from .operators.bpe import bpe_words, train_bpe_merges

    key = (spark.sparkContext.applicationId, sf_dir, corpus)
    hit = _BPE_CACHE.get(key)
    if hit is not None:
        return hit
    (documents,) = _t(spark, sf_dir, "documents")
    if corpus == "punct":
        documents = _punct_documents(documents)
    words = bpe_words(documents).localCheckpoint(eager=False)
    merges = [
        (r["step"], r["lhs"], r["rhs"], r["n"])
        for r in train_bpe_merges(words, n_merges=_BPE_N_MERGES)
        .orderBy("step")
        .collect()  # bounded: n_merges rows — the tokenizer artifact
    ]
    _BPE_CACHE[key] = (words, merges)
    return words, merges


_BPE_ENC_CACHE: dict = {}


def _encoded_words(spark, sf_dir, corpus: str = "plain"):
    """Checkpointed (w, freq, syms, n_subtokens) table, built LAZILY on
    first use and shared by EVERY encode consumer (encode / pack /
    vocab — projections are free off the checkpoint).  Round 6: runs
    through the vocab-scale merge-rank encoder
    (``operators/bpe.py::encode_with_merge_ranks`` — one Arrow pass
    over the DISTINCT-word table, cost independent of merge count)
    instead of the per-merge Catalyst fold chain; the fold path stays
    available for zero-Python small-N use and the cross-encoder
    equality law is pinned in tests/test_bpe.py."""
    from .operators.bpe import encode_with_merge_ranks

    key = (spark.sparkContext.applicationId, sf_dir, corpus)
    enc = _BPE_ENC_CACHE.get(key)
    if enc is None:
        words, merges = _trained_merges(spark, sf_dir, corpus)
        enc = encode_with_merge_ranks(
            words, merges, keep_syms=True
        ).localCheckpoint(eager=False)
        _BPE_ENC_CACHE[key] = enc
    return enc


def _bpe_train_oracle(n_merges: int, text_sql: str = "text") -> str:
    final = "\n    UNION ALL ".join(
        f"SELECT CAST({k} AS INTEGER) AS step, l AS lhs, r AS rhs, n FROM m{k}"
        for k in range(1, n_merges + 1)
    )
    return _bpe_rounds_ctes(n_merges, text_sql) + "\n    " + final


@query(
    "plan_cms_join_choice",
    """
    SELECT 'small_dim' AS join_case,
           (SELECT count(*) FROM lineitem l JOIN supplier s
            ON l.l_suppkey = s.s_suppkey) AS n_rows,
           TRUE AS plan_ok
    UNION ALL
    SELECT 'big_fact',
           (SELECT count(*) FROM lineitem l JOIN orders o
            ON l.l_orderkey = o.o_orderkey),
           TRUE
    """,
)
def plan_cms_join_choice(spark, sf_dir):
    """Sketch-guided join planning on real tables
    (``functions/cms.py::sketch_guided_join``): the physical strategy
    is chosen from the two key COUNT-MIN sketches alone — no shuffle of
    either input before the choice.  The supplier dimension fits the
    broadcast budget -> BroadcastHashJoin; the orders side exceeds a
    1k-row budget -> sort-merge.  ``plan_ok`` asserts the PLANNED
    strategy read from each join's physical plan (the planner decision
    the sketch drives; AQE may later convert at runtime, which is its
    job), so the plan assertion rides the oracle entry (VERDICT r4
    task 8); join row counts are the oracle-checked values."""
    from .functions.cms import sketch_guided_join

    lineitem, orders, supplier = _t(
        spark, sf_dir, "lineitem", "orders", "supplier"
    )
    j1, _ = sketch_guided_join(
        lineitem.select(F.col("l_suppkey").alias("k")),
        supplier.select(F.col("s_suppkey").alias("k")),
        "k",
        broadcast_rows=10_000_000,
    )
    p1 = j1._jdf.queryExecution().executedPlan().toString()
    n1 = j1.count()
    j2, _ = sketch_guided_join(
        lineitem.select(F.col("l_orderkey").alias("k")),
        orders.select(F.col("o_orderkey").alias("k")),
        "k",
        broadcast_rows=1_000,
    )
    p2 = j2._jdf.queryExecution().executedPlan().toString()
    n2 = j2.count()
    return local_frame(spark, 
        [
            ("small_dim", n1, "BroadcastHashJoin" in p1),
            ("big_fact", n2, "SortMergeJoin" in p2
             and "BroadcastHashJoin" not in p2),
        ],
        "join_case string, n_rows long, plan_ok boolean",
    )


@query(
    "dedup_semantic_clusters",
    """
    WITH
    v AS MATERIALIZED (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
    pairs AS MATERIALIZED (
      SELECT a.vec_id AS id_a, b.vec_id AS id_b
      FROM v a JOIN v b ON a.vec_id < b.vec_id
      WHERE round(list_cosine_similarity(a.v, b.v), 4) >= 0.45),"""
    + _cc_close_sql()
    + """
    SELECT comp, count(*) AS n_members, min(node) AS min_id,
           max(node) AS max_id, count(*) - 1 AS n_dropped
    FROM comp GROUP BY comp
    UNION ALL
    SELECT CAST(-1 AS BIGINT), CAST(-1 AS BIGINT), CAST(-1 AS BIGINT),
           CAST(-1 AS BIGINT), CAST(-1 AS BIGINT)
    FROM bad WHERE n > 0
    """,
)
def dedup_semantic_clusters(spark, sf_dir):
    """SemDeDup-style semantic dedup end to end
    (``operators/dedup.py::semantic_dedup_components``): duplicate
    pairs -> transitive collapse -> canonical survivors.  Run at
    ``nprobe = n_centroids``, where the candidate set is provably all
    pairs and ``semantic_dup_pairs`` DELEGATES to the blocked exact
    BLAS kernel — so what this oracle gates is the exact-pair kernel
    plus the component collapse.  The cluster-bucketed machinery
    (train/assign/bucket join) is pinned separately in
    tests/test_semantic_dedup.py: forced-bucketed probe-all must equal
    the delegated kernel, and selective-nprobe recall is asserted on
    planted duplicates."""
    from .operators.dedup import semantic_dedup_components

    (embeddings,) = _t(spark, sf_dir, "embeddings")
    return semantic_dedup_components(
        embeddings, "vec_id", "embedding", threshold=0.45,
        n_centroids=16, nprobe=16, seed=42,
    )


@query("bpe_train_merges", _bpe_train_oracle(_BPE_N_MERGES))
def bpe_train_merges(spark, sf_dir):
    """Full byte-level BPE tokenizer training over the corpus word
    table (``operators/bpe.py::train_bpe_merges``): 8 merge rounds,
    each one narrow pair-count shuffle over DISTINCT words plus a
    driver argmax of exactly one row, merge application as a JVM
    ``aggregate`` fold.  Symbols are per-UTF-8-byte hex strings
    (uppercase), so the trainer covers any input byte and the oracle's
    delimiter wrapping can never collide with symbol content.  Output:
    the ordered merges table (step, lhs, rhs, n) — the actual artifact
    a training pipeline consumes.  Shares one training run with
    ``bpe_encode_corpus`` via ``_trained_merges``."""
    _, merges = _trained_merges(spark, sf_dir)
    return local_frame(spark, 
        merges, "step int, lhs string, rhs string, n long"
    )


@query("bpe_train_punct", _bpe_train_oracle(_BPE_N_MERGES, _PUNCT_TEXT_SQL))
def bpe_train_punct(spark, sf_dir):
    """Byte-level BPE training over a corpus slice CONTAINING
    punctuation and digits (the driver testdata is pure ``[a-z ]``, so
    the entry derives one deterministically on both sides —
    ``_PUNCT_TEXT_SQL`` / ``_punct_documents``).  Pre-tokenization
    class-splits '+-19' into the punct run '+-' and digit run '19',
    and '#42!' into [#, 42, !]; the hex-symbol representation gives
    every punctuation byte a first-class vocabulary entry, and the
    inter-word runs are frequent enough that punct/digit byte pairs
    WIN early merges (the output table differs from the letters-only
    corpus, so the gate actually differentiates).  This is the round-6
    "done" gate for byte-level pre-tokenization: merges trained over
    real punctuation/digit runs, hash-matched against the unrolled
    DuckDB replay."""
    _, merges = _trained_merges(spark, sf_dir, corpus="punct")
    return local_frame(spark, 
        merges, "step int, lhs string, rhs string, n long"
    )


def _bpe_encode_oracle(text_sql: str = "text") -> str:
    return (
        _bpe_rounds_ctes(_BPE_N_MERGES, text_sql)
        + f""",
    enc AS MATERIALIZED (
      SELECT w, len(string_split(st[2:len(st)-1], ')(')) AS nsub
      FROM s{_BPE_N_MERGES}),
    tok AS (
      SELECT lang, unnest(regexp_extract_all(lower({text_sql}),
                                             '{PRE_TOKEN_RE}')) AS w
      FROM documents)
    SELECT lang, count(*) AS n_words,
           CAST(sum(nsub) AS BIGINT) AS n_subtokens,
           CAST((sum(nsub) * 1000000) // count(*) AS BIGINT)
             AS subtokens_per_word_ppm
    FROM tok JOIN enc USING (w)
    GROUP BY lang
    """
    )


def _encode_corpus_accounting(spark, sf_dir, corpus: str):
    from .operators.bpe import corpus_word_stream

    (documents,) = _t(spark, sf_dir, "documents")
    if corpus == "punct":
        documents = _punct_documents(documents)
    enc = _encoded_words(spark, sf_dir, corpus).select("w", "n_subtokens")
    corpus_words = corpus_word_stream(documents, "text", "lang")
    return (
        corpus_words.join(enc, "w")
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_words"),
            F.sum("n_subtokens").cast("bigint").alias("n_subtokens"),
        )
        .select(
            "lang",
            "n_words",
            "n_subtokens",
            F.expr("CAST((n_subtokens * 1000000) DIV n_words AS BIGINT)")
            .alias("subtokens_per_word_ppm"),
        )
    )


@query("bpe_encode_corpus", _bpe_encode_oracle())
def bpe_encode_corpus(spark, sf_dir):
    """The trained tokenizer APPLIED — the consumer side of
    ``bpe_train_merges``: train the 8 merges, encode every DISTINCT
    word once through the vocab-scale merge-rank encoder
    (``operators/bpe.py::encode_with_merge_ranks`` — ONE Arrow pass
    over the vocab, cost independent of merge count; the corpus-sized
    token stream never sees the merges), then join the encoded lengths
    back onto the corpus word stream for per-lang token accounting
    (the number a training-data budget actually needs).  Compression
    is reported as integer ppm so any engine replays it exactly.  The
    byte-level pre-tokenizer means every token is in the trainer's
    universe — the inner join drops nothing."""
    return _encode_corpus_accounting(spark, sf_dir, "plain")


@query("bpe_encode_punct", _bpe_encode_oracle(_PUNCT_TEXT_SQL))
def bpe_encode_punct(spark, sf_dir):
    """``bpe_encode_corpus`` over the punctuated-derivative corpus
    (``bpe_train_punct``'s slice): proves the encode path — merge-rank
    encoder plus corpus join — handles punctuation/digit pre-tokens
    end to end under the oracle gate, not just in pytest.  Shares the
    punct training run and encoded-word checkpoint via the session
    caches."""
    return _encode_corpus_accounting(spark, sf_dir, "punct")


@query(
    "prep_pack_bpe_budget",
    _bpe_rounds_ctes(_BPE_N_MERGES)
    + f""",
    enc AS MATERIALIZED (
      SELECT w, len(string_split(st[2:len(st)-1], ')(')) AS nsub
      FROM s{_BPE_N_MERGES}),
    doc AS MATERIALIZED (
      SELECT doc_id, CAST(sum(nsub) AS BIGINT) AS tok FROM (
        SELECT doc_id, unnest(regexp_extract_all(lower(text),
                                                 '{PRE_TOKEN_RE}')) AS w
        FROM documents) JOIN enc USING (w)
      GROUP BY doc_id),
    c AS (
      SELECT doc_id % 8 AS shard, tok,
             sum(tok) OVER (PARTITION BY doc_id % 8 ORDER BY doc_id
                            ROWS UNBOUNDED PRECEDING) - tok AS excl
      FROM doc)
    SELECT CAST(shard AS BIGINT) AS shard,
           CAST(floor(excl / 512) AS BIGINT) AS pack_id,
           count(*) AS n_docs, CAST(sum(tok) AS BIGINT) AS pack_tokens
    FROM c GROUP BY shard, pack_id
    """,
)
def prep_pack_bpe_budget(spark, sf_dir):
    """The trainer's final layout job, composed end to end: train the
    tokenizer (shared run, ``_trained_merges``), encode every DISTINCT
    word once, roll encoded lengths up to per-document SUBTOKEN counts,
    then contiguous-pack documents into 512-SUBTOKEN training
    sequences across 8 shards (``operators/prep.py::pack_sequences``,
    window cumsum — no Python, no global sort).  This is
    ``prep_pack_contiguous`` with the whitespace token count replaced
    by the learned tokenizer's actual cost — the budget that matters
    to a training run.  Under the byte-level pre-tokenizer every
    non-empty document has subtokens, so nothing drops out of the
    layout."""
    from .operators.bpe import corpus_word_stream
    from .operators.prep import pack_sequences

    (documents,) = _t(spark, sf_dir, "documents")
    enc = _encoded_words(spark, sf_dir).select("w", "n_subtokens")
    doc_tokens = (
        corpus_word_stream(documents, "text", "doc_id")
        .join(enc, "w")
        .groupBy("doc_id")
        .agg(F.sum("n_subtokens").cast("bigint").alias("tok"))
    )
    packed = pack_sequences(
        doc_tokens, "doc_id", "tok", budget=512, num_shards=8,
        order_cols=["doc_id"],
    )
    return packed.groupBy("shard", "pack_id").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("tok").cast("bigint").alias("pack_tokens"),
    )


@query(
    "bpe_vocab_table",
    _bpe_rounds_ctes(_BPE_N_MERGES)
    + f""",
    base AS MATERIALIZED (
      SELECT DISTINCT unnest([substr(hex(w), i*2-1, 2)
                              FOR i IN range(1, len(hex(w))//2 + 1)]) AS symbol
      FROM w0),
    base_ids AS (
      SELECT symbol, 'base' AS kind,
             CAST(row_number() OVER (ORDER BY symbol) - 1 AS BIGINT)
               AS token_id
      FROM base),
    merged_ids AS (
      {" UNION ALL ".join(
          f"SELECT l || r AS symbol, 'merged' AS kind, "
          f"(SELECT count(*) FROM base) + {k} - 1 AS token_id FROM m{k}"
          for k in range(1, _BPE_N_MERGES + 1)
      )}),
    occ AS MATERIALIZED (
      SELECT sym AS symbol, CAST(sum(freq) AS BIGINT) AS corpus_occ FROM (
        SELECT unnest(string_split(st[2:len(st)-1], ')(')) AS sym, freq
        FROM s{_BPE_N_MERGES})
      GROUP BY sym)
    SELECT v.symbol, v.kind, v.token_id,
           coalesce(o.corpus_occ, 0) AS corpus_occ
    FROM (SELECT * FROM base_ids UNION ALL SELECT * FROM merged_ids) v
    LEFT JOIN occ o ON o.symbol = v.symbol
    """,
)
def bpe_vocab_table(spark, sf_dir):
    """The tokenizer's VOCABULARY artifact: base symbols (the corpus's
    characters, ids assigned alphabetically) plus the N merged symbols
    (ids continuing in merge order — the standard BPE id convention),
    each with its occurrence count in the fully ENCODED corpus
    (weighted by word frequency).  A merged symbol later consumed by a
    bigger merge keeps its id but shows the residual occurrence count
    — exactly what a tokenizer-coverage report needs.  All driver
    materializations are bounded: <=256 base byte symbols, N merge
    rows — so the whole vocab skeleton is built driver-side in ONE
    collect (no global window, no second corpus-derived job) and only
    the occurrence aggregation runs distributed, off the session's
    shared encoded-word checkpoint."""
    from .operators.bpe import word_syms

    _, merges = _trained_merges(spark, sf_dir)
    enc = _encoded_words(spark, sf_dir)
    occ = (
        enc.select(F.explode("syms").alias("symbol"), "freq")
        .groupBy("symbol")
        .agg(F.sum("freq").cast("bigint").alias("corpus_occ"))
    )
    base_syms = sorted(
        r["symbol"]
        for r in enc.select(F.explode(word_syms(F.col("w"))).alias("symbol"))
        .distinct()
        .collect()  # bounded: <= 256 byte values
    )
    vocab_rows = [(s, "base", i) for i, s in enumerate(base_syms)] + [
        (l + r, "merged", len(base_syms) + step - 1)
        for step, l, r, _ in merges
    ]
    vocab = local_frame(spark, 
        vocab_rows, "symbol string, kind string, token_id long"
    )
    return vocab.join(occ, "symbol", "left").select(
        "symbol",
        "kind",
        "token_id",
        F.coalesce("corpus_occ", F.lit(0)).alias("corpus_occ"),
    )


@query(
    "dedup_semantic_docs",
    f"""
    WITH
    tok AS MATERIALIZED (
      SELECT doc_id, unnest(regexp_extract_all(lower(text),
                                               '{PRE_TOKEN_RE}')) AS w
      FROM documents),
    hb AS (
      SELECT doc_id,
             CAST(('0x' || substr(md5(w), 1, 4)) AS BIGINT) % 32 AS b,
             CASE WHEN CAST(('0x' || substr(md5(w), 5, 1)) AS BIGINT) % 2 = 0
                  THEN 1 ELSE -1 END AS s
      FROM tok),
    agg AS MATERIALIZED (
      SELECT doc_id, b, CAST(sum(s) AS DOUBLE) AS v
      FROM hb GROUP BY doc_id, b),
    nrm AS MATERIALIZED (
      SELECT doc_id, sqrt(sum(v*v)) AS n FROM agg GROUP BY doc_id),
    dots AS (
      SELECT a.doc_id AS ia, b.doc_id AS ib, sum(a.v * b.v) AS dot
      FROM agg a JOIN agg b ON a.b = b.b AND a.doc_id < b.doc_id
      GROUP BY 1, 2),
    pairs AS MATERIALIZED (
      SELECT ia AS id_a, ib AS id_b
      FROM dots JOIN nrm x ON x.doc_id = ia JOIN nrm y ON y.doc_id = ib
      WHERE x.n > 0 AND y.n > 0
        AND round(dot / (x.n * y.n), 4) >= 0.95),"""
    + _cc_close_sql()
    + """
    SELECT comp, count(*) AS n_members, min(node) AS min_id,
           max(node) AS max_id, count(*) - 1 AS n_dropped
    FROM comp GROUP BY comp
    UNION ALL
    SELECT CAST(-1 AS BIGINT), CAST(-1 AS BIGINT), CAST(-1 AS BIGINT),
           CAST(-1 AS BIGINT), CAST(-1 AS BIGINT)
    FROM bad WHERE n > 0
    """,
)
def dedup_semantic_docs(spark, sf_dir):
    """Model-free semantic dedup over RAW TEXT: hashing-trick document
    embeddings (``operators/dedup.py::doc_hash_embeddings`` — md5
    bucket + ±1 sign per token, replayable bit-exactly in any SQL
    engine) fed through the same cluster-then-prune machine as
    ``dedup_semantic_clusters`` at probe-all, collapsed into duplicate
    components with min-id survivors.  The oracle recomputes the
    cosine RELATIONALLY (a bucket equi-join dot product — no arrays,
    no lambdas) and closes the pair graph with the shared unrolled
    propagation.  Cosine >= 0.95 over signed 32-bucket count vectors
    is a near-identical-token-multiset signal — the semantic-dedup
    tier a pipeline can run before any embedding model exists."""
    from .operators.dedup import doc_hash_embeddings, semantic_dedup_components

    (documents,) = _t(spark, sf_dir, "documents")
    embeds = doc_hash_embeddings(documents, "doc_id", "text", dim=32)
    return semantic_dedup_components(
        embeds, "doc_id", "vec", threshold=0.95,
        n_centroids=16, nprobe=16, seed=42,
    )


# Round-6 extension (selective semantic dedup, streaming ingest dedup,
# multimodal components, CMS skew planner) registers on import.
from . import queries_r6  # noqa: E402,F401  (registration side effect)
