"""DataFrame-level operators beyond the Column function library:
temporal joins, sessionization, deduplication, similarity search.

Each operator is a composition of built-in DataFrame transformations
chosen for 100 TB behavior (single shuffle on the natural key, no
driver-side collection, broadcast where one side is small).
"""

from .dedup import (
    cosine_similarity,
    embedding_near_dup_pairs,
    exact_dedup,
    exact_dedup_keep_min,
    minhash_lsh_pairs,
    minhash_signature,
    ngram_jaccard_pairs,
    simhash64,
    simhash_fingerprints,
    simhash_pairs,
)
from .curate import curate_corpus, curation_report
from .expectations import check_expectations, psi_drift
from .graph import connected_components, pagerank
from .incremental import agg_state, finalize, merge_states
from .profile import profile_table
from .scd import scd2_apply
from .similarity import brute_force_topk, brute_force_topk_np, ivf_topk, lsh_topk
from .skew import hot_keys, salted_join
from .temporal import as_of_join, range_pair_join, sessionize

__all__ = [
    "as_of_join",
    "range_pair_join",
    "sessionize",
    "exact_dedup",
    "exact_dedup_keep_min",
    "ngram_jaccard_pairs",
    "minhash_signature",
    "minhash_lsh_pairs",
    "simhash64",
    "simhash_fingerprints",
    "simhash_pairs",
    "cosine_similarity",
    "embedding_near_dup_pairs",
    "brute_force_topk",
    "brute_force_topk_np",
    "ivf_topk",
    "lsh_topk",
    "curate_corpus",
    "curation_report",
    "hot_keys",
    "salted_join",
    "connected_components",
    "pagerank",
    "scd2_apply",
    "profile_table",
    "check_expectations",
    "psi_drift",
    "agg_state",
    "merge_states",
    "finalize",
]
