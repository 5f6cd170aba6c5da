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
    spark.udtf.register("longest_streak_udtf", LongestStreak)
    # analyze()-schema UDTF: decorate WITHOUT returnType (the schema
    # comes from SplitParts.analyze at plan time)
    spark.udtf.register("split_parts_udtf", udtf(SplitParts, useArrow=True))


@udtf(returnType="user_id bigint, best_type string, best_streak int, n_rows int")
class LongestStreak:
    """Per-partition table-argument UDTF: consumes one user's events
    (``TABLE(...) PARTITION BY user_id ORDER BY ts``) and emits that
    user's longest run of consecutive identical event types — the
    imperative per-group scan SQL can't express without window
    gymnastics, showing the Spark 4 polymorphic-table-function seam.

    Ties resolve to the streak seen first in time order (deterministic
    given the ORDER BY)."""

    def __init__(self):
        self._user = None
        self._seen = False  # first-row flag — NOT self._user, which a
        # NULL-user_id partition would leave None forever (ADVICE r10:
        # the old sentinel re-ran the contract check per row and
        # dropped the group's output row)
        self._types: list = []

    def eval(self, row):
        # eval runs once PER ROW even under Arrow serialization (the
        # UDTF API's documented row tax — a no-op eval measures ~110
        # microseconds/row on this box, all serializer), so the body
        # is kept to the two cheapest operations: first-row
        # contract check + a list append.  The streak scan itself runs
        # at C speed in terminate via itertools.groupby (r10: the
        # per-row branch-and-compare streak fold added ~40% on top of
        # the serializer floor).  Positional access: Row.__getitem__
        # by index skips the per-row field-name lookup.  The
        # projection order is part of this UDTF's contract — verified
        # ONCE per group so a caller passing TABLE(...) with reordered
        # columns fails loudly instead of computing streaks over the
        # wrong column.
        if not self._seen:
            if tuple(row.__fields__[:2]) != ("user_id", "event_type"):
                raise ValueError(
                    "longest_streak_udtf expects TABLE(... ) projected as "
                    f"(user_id, event_type, ...); got {row.__fields__}"
                )
            self._user = row[0]
            self._seen = True
        self._types.append(row[1])

    def terminate(self):
        if not self._seen:
            return
        from itertools import groupby

        best, best_type = 0, None
        for t, run in groupby(self._types):
            n = sum(1 for _ in run)
            if n > best:  # strict: ties keep the FIRST streak in order
                best, best_type = n, t
        yield (self._user, best_type, best, len(self._types))


class SplitParts:
    """POLYMORPHIC UDTF: the output schema is computed at plan time by
    ``analyze()`` from a constant argument — ``split_parts_udtf(text,
    3)`` yields columns (p0, p1, p2), ``..., 5)`` yields five.  This is
    the Spark 4 dynamic-schema seam (AnalyzeResult) that fixed
    ``returnType`` UDTFs cannot express; the reference has no
    table-function surface at all (SURVEY.md §2.2).

    eval pads with NULLs when the text has fewer tokens (same
    single-space split convention as Tokenize)."""

    @staticmethod
    def analyze(text, n):
        from pyspark.sql.types import StringType, StructType
        from pyspark.sql.udtf import AnalyzeResult

        # type() not isinstance(): bool subclasses int, and `true` as n
        # must raise, not silently build a 1-column schema
        if type(n.value) is not int or n.value < 1:
            raise ValueError("split_parts_udtf: n must be a positive int literal")
        schema = StructType()
        for i in range(n.value):
            schema = schema.add(f"p{i}", StringType())
        return AnalyzeResult(schema=schema)

    def eval(self, text: str, n: int):
        parts = [t for t in (text or "").split(" ") if t]
        yield tuple(parts[i] if i < len(parts) else None for i in range(n))
