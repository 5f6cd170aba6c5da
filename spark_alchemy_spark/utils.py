"""Method-chaining ergonomics: the PySpark analogue of the reference's
``AnyExtensions`` (reference alchemy/.../utils/AnyExtensions.scala:9-183
— transform/transformIf/transformWhen, tap*, throwIf/throwWhen).

PySpark already has ``DataFrame.transform``; these helpers complete the
chaining vocabulary without monkey-patching: every function takes the
DataFrame first so it composes with ``.transform(lambda df: ...)`` or
plain calls.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame


def pipe(df: DataFrame, *fns: Callable[[DataFrame], DataFrame]) -> DataFrame:
    """Left-to-right application: ``pipe(df, f, g) == g(f(df))``
    (AnyExtensions.transform chaining)."""
    for fn in fns:
        df = fn(df)
    return df


def transform_if(
    df: DataFrame, cond: bool, fn: Callable[[DataFrame], DataFrame]
) -> DataFrame:
    """Apply ``fn`` only when ``cond`` holds (AnyExtensions.transformIf)."""
    return fn(df) if cond else df


def transform_when(
    df: DataFrame,
    pred: Callable[[DataFrame], bool],
    fn: Callable[[DataFrame], DataFrame],
) -> DataFrame:
    """Apply ``fn`` when ``pred(df)`` holds (AnyExtensions.transformWhen);
    the predicate sees the DataFrame (e.g. schema checks)."""
    return fn(df) if pred(df) else df


def tap(df: DataFrame, fn: Callable[[DataFrame], object]) -> DataFrame:
    """Run ``fn`` for its side effect, return ``df`` unchanged
    (AnyExtensions.tap) — logging/metrics inside a chain."""
    fn(df)
    return df


def throw_if(df: DataFrame, cond: bool, message: str) -> DataFrame:
    """Raise mid-chain when ``cond`` holds (AnyExtensions.throwIf)."""
    if cond:
        raise ValueError(message)
    return df


def throw_when(
    df: DataFrame, pred: Callable[[DataFrame], bool], message: str
) -> DataFrame:
    """Raise mid-chain when ``pred(df)`` holds (AnyExtensions.throwWhen)."""
    if pred(df):
        raise ValueError(message)
    return df
