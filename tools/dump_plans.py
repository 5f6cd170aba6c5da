"""Dump .explain('formatted') for named battery entries to
plans/<round>/<entry>_<suffix>.txt (the optimization round's evidence
files).  Entries whose returned DataFrame is a driver-built literal
(the lifecycle invariant rows) still dump that plan; their real work
is internal jobs, profiled separately by tools/profile_entry.py.

Usage: python tools/dump_plans.py before|after entry1,entry2,... [round_dir=r11]
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main():
    suffix = sys.argv[1]
    names = sys.argv[2].split(",")
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    rdir = sys.argv[3] if len(sys.argv) > 3 else "r11"
    out_dir = os.path.join(REPO, "plans", rdir)
    os.makedirs(out_dir, exist_ok=True)

    import __spark_entry__ as entrymod
    from spark_alchemy_spark.session import build_session

    spark = build_session("plans", extra_conf={"spark.ui.enabled": "false"})
    spark.sparkContext.setLogLevel("ERROR")
    qs = entrymod.queries()
    for name in names:
        df = qs[name](spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(f"wrote {path} ({len(plan)} chars)", file=sys.stderr)
    spark.stop()


if __name__ == "__main__":
    main()
