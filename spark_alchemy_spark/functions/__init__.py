"""Column-level function library (the reference's product surface).

``from spark_alchemy_spark import functions as AF`` then
``df.groupBy(...).agg(AF.hll_init_agg("id"))``.
"""

from .hashing import cardinality_hash, element_hashes, resolve_dtype
from .hll import (
    BoundHLL,
    bound_hll,
    hll_cardinality,
    hll_convert,
    hll_init,
    hll_init_agg,
    hll_init_collection,
    hll_init_collection_agg,
    hll_intersect_cardinality,
    hll_merge,
    hll_row_merge,
    register,
)

__all__ = [
    "cardinality_hash",
    "element_hashes",
    "resolve_dtype",
    "BoundHLL",
    "bound_hll",
    "hll_cardinality",
    "hll_convert",
    "hll_init",
    "hll_init_agg",
    "hll_init_collection",
    "hll_init_collection_agg",
    "hll_intersect_cardinality",
    "hll_merge",
    "hll_row_merge",
    "register",
]
