"""Python user-defined table functions (Spark 3.5+ ``@udtf``): the
1→N row-expansion surface at the SQL level.

The reference's UDF story is JVM-side Catalyst expressions
(SURVEY.md §2.2, hll/HLLFunctions.scala); the Python-native analogue
for *table* functions is the UDTF — registered once, then used in the
FROM clause with LATERAL, letting SQL users expand a row into many
without leaving the query language.

Scale note: UDTFs evaluate per-row in Python workers; keep them off
the hot path for bulk tokenization (functions/text.py does that with
JVM ``split``/``explode``).  The UDTF surface exists for logic that
genuinely needs imperative Python per row.
"""

from __future__ import annotations

from pyspark.sql.functions import udtf


@udtf(returnType="pos int, token string", useArrow=True)
class Tokenize:
    """Explode a text into (position, token) rows; single-space split,
    empty tokens skipped (same convention as functions/text.py and the
    DuckDB oracles' string_split)."""

    def eval(self, text: str):
        if text is None:
            return
        pos = 0
        for tok in text.split(" "):
            if tok:
                yield (pos, tok)
                pos += 1


def register(spark) -> None:
    spark.udtf.register("tokenize_udtf", Tokenize)
