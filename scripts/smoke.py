"""End-of-round smoke gate: never snapshot with a broken registry.

Round 4 shipped a one-line ImportError in its final commit (made after
the last test run) that took down a query, the correctness slot, AND the
round's whole bench artifact.  This script is the cheap gate: run it
(plus `pytest tests/ -q`) before any end-of-round commit.

Checks, in order:
1. `__spark_entry__` imports and exposes entry/queries/oracle_sql;
2. every oracle_sql key has a queries() entry (no orphan oracles);
3. entry(spark) runs and returns rows at sf0.001;
4. EVERY queries() entry builds AND executes (count) at sf0.001 —
   streaming entries actually run their pipeline, so this exercises the
   exact code path the driver's correctness harness uses.

Exit code 0 = clean; 1 = failures (each listed on stderr).

Usage: python scripts/smoke.py  [~2-3 min on local[8] at sf0.001]
"""

from __future__ import annotations

import os
import sys
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SMOKE_SF_DIR", "/root/testdata/sf0.001")


def main() -> int:
    import __spark_entry__ as entry_mod
    from frizzle_spark.session import get_spark

    spark = get_spark("frizzle_spark-smoke")
    failures: list[str] = []

    queries = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    orphans = sorted(set(oracles) - set(queries))
    if orphans:
        failures.append(f"oracle_sql keys without queries() entries: {orphans}")

    try:
        n = entry_mod.entry(spark).count()
        print(f"# entry(): {n} rows", file=sys.stderr)
    except Exception:
        failures.append(f"entry() raised:\n{traceback.format_exc()}")

    for name in sorted(queries):
        t0 = time.perf_counter()
        try:
            n = queries[name](spark, SF_DIR).count()
            print(
                f"# {name}: {n} rows in {time.perf_counter() - t0:.2f}s",
                file=sys.stderr,
            )
        except Exception:
            failures.append(f"{name} raised:\n{traceback.format_exc()}")
            print(f"# {name}: FAILED", file=sys.stderr)

    if failures:
        print(f"\nSMOKE FAILED — {len(failures)} failure(s):", file=sys.stderr)
        for f in failures:
            print(f"--- {f}", file=sys.stderr)
        return 1
    print(f"SMOKE OK — {len(queries)} queries + entry() green at {SF_DIR}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
