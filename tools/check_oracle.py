"""Local stand-in for the driver's t2 correctness gate: run each
``queries()`` entry on Spark and its ``oracle_sql()`` on DuckDB over the
same sf dir, compare row count, column names, and an order-insensitive
value hash (values normalized: floats rounded to 9 significant digits,
timestamps to ISO strings).

Usage: python tools/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import hashlib
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import duckdb  # noqa: E402

import __spark_entry__ as entrymod  # noqa: E402
from spark_alchemy_spark.session import build_session  # noqa: E402
from spark_alchemy_spark.sources import TABLES  # noqa: E402


def _norm(v):
    import datetime
    import math

    if v is None:
        return "\x00"
    if isinstance(v, bool):
        return f"b:{int(v)}"
    if isinstance(v, float):
        if math.isnan(v):
            return "f:nan"
        return f"f:{v:.9g}"
    if isinstance(v, (datetime.datetime, datetime.date)):
        return f"t:{v.isoformat()}"
    return f"{type(v).__name__[0]}:{v}"


def table_hash(rows, colnames):
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])
    lines = sorted(
        "\x01".join(_norm(row[i]) for i in order) for row in rows
    )
    h = hashlib.sha256()
    for line in lines:
        h.update(line.encode())
        h.update(b"\n")
    return h.hexdigest()[:16]


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    spark = build_session(
        "oracle-check", extra_conf={"spark.ui.enabled": "false"}
    )
    spark.sparkContext.setLogLevel("ERROR")

    con = duckdb.connect()
    for t in TABLES:
        con.sql(
            f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as e:
            print(f"FAIL {name}: spark error: {str(e)[:300]}")
            failures.append(name)
            continue
        if name not in oracles:
            print(f"ok?  {name}: rows={len(srows)} (no oracle, rows-only check)")
            continue
        try:
            rel = con.sql(oracles[name])
            ocols = [c for c in rel.columns]
            orows = rel.fetchall()
        except Exception as e:
            print(f"FAIL {name}: duckdb error: {str(e)[:300]}")
            failures.append(name)
            continue
        problems = []
        if len(srows) != len(orows):
            problems.append(f"rowcount {len(srows)} vs {len(orows)}")
        if sorted(scols) != sorted(ocols):
            problems.append(f"columns {sorted(scols)} vs {sorted(ocols)}")
        if not problems:
            sh, oh = table_hash(srows, scols), table_hash(orows, ocols)
            if sh != oh:
                problems.append(f"value hash {sh} vs {oh}")
                # show first diffs for debugging
                sset = {tuple(_norm(v) for v in r) for r in srows}
                oset = {tuple(_norm(v) for v in r) for r in orows}
                so = list(sset - oset)[:3]
                os_ = list(oset - sset)[:3]
                if so:
                    problems.append(f"spark-only: {so}")
                if os_:
                    problems.append(f"oracle-only: {os_}")
        dt = time.time() - t0
        if problems:
            print(f"FAIL {name} ({dt:.1f}s): " + "; ".join(str(p) for p in problems))
            failures.append(name)
        else:
            print(f"PASS {name} ({dt:.1f}s): rows={len(srows)}")
    print()
    print(f"{len(failures)} failures" + (": " + ", ".join(failures) if failures else ""))
    spark.stop()
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
