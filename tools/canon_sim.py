"""Driver-faithful canonicalizer simulation.

The round driver's correctness gate collects each sampled battery
entry, canonicalizes with pandas (column-sorted, then
``sort_values`` over ALL columns), and value-hashes.  pandas cannot
sort list-valued cells (round-3 ``media_image_features`` burned its
gate slot on exactly this), so this tool replays that canonicalization
against the gate head (or any named entries) and reports rows the
driver would error on — run it after adding/changing gate-head entries
or when the driver regenerates testdata.

Usage: python tools/canon_sim.py [sf_dir] [entry ...]
       (default: /root/testdata/sf0.01, all _GATE_HEAD entries)
"""

from __future__ import annotations

import hashlib
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main():
    args = sys.argv[1:]
    sf_dir = args[0] if args and os.path.isdir(args[0]) else "/root/testdata/sf0.01"
    import __spark_entry__ as entrymod
    from spark_alchemy_spark.session import build_session

    names = [a for a in args if not os.path.isdir(a)] or list(entrymod._GATE_HEAD)
    spark = build_session(
        "canon-sim",
        extra_conf={
            "spark.ui.enabled": "false",
            "spark.ui.showConsoleProgress": "false",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    qs = entrymod.queries()
    failures = []
    for name in names:
        try:
            pdf = qs[name](spark, sf_dir).toPandas()
            pdf = pdf.reindex(sorted(pdf.columns), axis=1)
            pdf = pdf.sort_values(by=list(pdf.columns)).reset_index(drop=True)
            digest = hashlib.sha256(pdf.to_csv(index=False).encode()).hexdigest()[:16]
            print(f"OK   {name}: rows={len(pdf)} hash={digest}")
        except Exception as e:  # the driver records this row as ERR
            failures.append(name)
            print(f"FAIL {name}: {type(e).__name__}: {str(e)[:160]}")
    print(f"\n{len(failures)} canonicalizer failures" + (f": {failures}" if failures else ""))
    spark.stop()
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
