"""Plan audit over the whole battery: per query, the physical-plan
properties that matter at 100 TB — join strategies, shuffle count,
exchange reuse, codegen spans, Python boundaries, pushed filters.

Usage: python tools/explain_audit.py [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from spark_alchemy_spark import plans  # noqa: E402
from spark_alchemy_spark.queries import QUERIES  # noqa: E402
from spark_alchemy_spark.session import build_session  # noqa: E402


def main():
    args = sys.argv[1:]
    sf_dir = args[0] if args and os.path.isdir(args[0]) else "/root/testdata/sf0.001"
    names = [a for a in args if not os.path.isdir(a)] or list(QUERIES)
    spark = build_session(
        "explain-audit",
        extra_conf={"spark.ui.enabled": "false", "spark.ui.showConsoleProgress": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    for name in names:
        if name.startswith("stream_"):
            print(f"{name:38s} (streaming: plan formed at runtime, skipped)")
            continue
        try:
            df = QUERIES[name](spark, sf_dir)
            # materialize THIS df's QueryExecution first (collect, not
            # a noop write — write spawns a separate execution): with
            # AQE the pre-execution plan is not final (codegen ids
            # unassigned, runtime join/skew conversions not applied) —
            # the audit must describe the plan that actually ran
            df.collect()
            joins = ",".join(plans.join_strategies(df)) or "-"
            print(
                f"{name:38s} joins={joins} "
                f"xchg={plans.num_exchanges(df)} "
                f"reuse={plans.num_reused_exchanges(df)} "
                f"wscg={plans.codegen_stage_count(df)} "
                f"py={','.join(plans.python_eval_ops(df)) or '-'}"
            )
        except Exception as e:  # pragma: no cover
            print(f"{name:38s} ERROR {type(e).__name__}: {e}")
    spark.stop()


if __name__ == "__main__":
    main()
