"""Session configuration keys and precision math for the HLL veneer.

Mirrors the reference's backend-resolution precedence (argument >
session conf > default) and its error->precision formula:
  reference: alchemy/.../hll/HLLFunctions.scala:24-70 and
  alchemy/.../hll/package.scala:13 (conf key
  ``com.swoop.alchemy.hll.implementation``).

Our execution backend is Apache Datasketches via Spark >=3.5 built-ins
(``hll_sketch_agg`` & co.), name ``DS``.  The reference's ``STRM`` /
``AGKN`` backends are an on-disk byte format concern, not an execution
one; ``AGKN`` bytes are available through
:func:`spark_alchemy_spark.functions.hll.hll_convert` for
postgresql-hll interop.
"""

from __future__ import annotations

import math

# Conf key controlling the default backend (precedence: per-call arg >
# this conf > default), same shape as the reference's
# `com.swoop.alchemy.hll.implementation`.
IMPLEMENTATION_CONF_KEY = "spark.alchemy.hll.implementation"

# Conf key for the default relative standard deviation used when a
# function is called without an explicit one.
DEFAULT_ERROR_CONF_KEY = "spark.alchemy.hll.relativeSD"

#: Default relative standard deviation (reference HLLFunctions.scala:194).
DEFAULT_RELATIVE_SD = 0.05

#: Datasketches lgConfigK limits (Spark enforces 4..21).
MIN_LG_K = 4
MAX_LG_K = 21

#: Supported backend names.  ``DS`` = Datasketches (execution), ``AGKN``
#: = postgresql-hll compatible bytes, ``STRM`` = StreamLib HLL+ bytes
#: (the latter two are byte formats for hll_convert, not execution
#: backends).
BACKENDS = ("DS", "AGKN")

#: Byte formats accepted as conversion endpoints by hll_convert.
CONVERSION_FORMATS = ("DS", "AGKN", "STRM")


def precision_from_error(relative_sd: float) -> int:
    """relativeSD -> lgConfigK using the reference's formula.

    reference: HLLFunctions.scala:67-70 —
      p = ceil(2 * log(1.106 / sd) / log 2), require p >= 4
    which caps the max error at 0.39 (0.40 must raise).
    """
    if not (0.0 < relative_sd):
        raise ValueError(f"relative_sd must be > 0, got {relative_sd}")
    p = int(math.ceil(2.0 * math.log(1.106 / relative_sd) / math.log(2.0)))
    if p < MIN_LG_K:
        raise ValueError(
            f"HLL requires at least 4 bits for addressing; "
            f"use a lower error, at most 0.39 (got relative_sd={relative_sd})"
        )
    return min(p, MAX_LG_K)


def error_from_precision(lg_k: int) -> float:
    """Inverse of :func:`precision_from_error` (approximate)."""
    return 1.106 / math.sqrt(2.0 ** lg_k)


def resolve_backend(spark, impl: str | None, for_conversion: bool = False) -> str:
    """Per-call arg > session conf > 'DS' default.

    reference: HLLFunctions.scala:34-41 (same precedence chain).
    With ``for_conversion`` the STRM/AGKN byte formats are accepted
    (hll_convert endpoints); as an EXECUTION backend STRM still raises —
    the engine runs on Datasketches.
    """
    name = impl
    if name is None and spark is not None:
        name = spark.conf.get(IMPLEMENTATION_CONF_KEY, None)
    name = (name or "DS").upper()
    if name == "STREAMLIB":
        name = "STRM"
    if for_conversion:
        if name not in CONVERSION_FORMATS:
            raise ValueError(
                f"Unknown sketch byte format {name!r}; expected one of "
                f"{CONVERSION_FORMATS}"
            )
        return name
    if name == "STRM":
        raise ValueError(
            "backend 'STRM' (StreamLib) is not an execution backend here; "
            "the engine runs on Datasketches ('DS'). Use hll_convert for "
            "StreamLib ('STRM') / postgresql-hll ('AGKN') byte interop."
        )
    if name not in BACKENDS:
        raise ValueError(f"Unknown HLL backend {name!r}; expected one of {BACKENDS}")
    return name
