"""Measure the write-layout pruning claims (VERDICT r5 'Next round' #8).

Writes the sf0.1 ``lineitem`` table in three layouts — plain (hash
repartition), range-clustered on ``l_orderkey`` (write_clustered), and
Z-ordered on (``l_orderkey``, ``l_partkey``) (write_zordered) — then,
for selective predicates on each clustered column, counts what a
parquet-stats-aware reader must actually touch:

* files whose per-column min/max admits the predicate (file pruning —
  what Spark's FileSourceScanExec skips via footer stats / what a
  catalog with file-level stats skips at planning time), and
* row groups likewise (row-group pruning inside touched files).

The counts come straight from the parquet footers via pyarrow, so they
are the ground truth of the layout, not a benchmark of one reader's
heuristics.  Spark-side correctness is asserted (all three layouts
return identical predicate counts).  Prints one JSON line; SCALE.md
records the table.

Usage: python scripts/layout_pruning_bench.py [sf_dir]
"""

from __future__ import annotations

import glob
import json
import os
import shutil
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyarrow.parquet as pq


def stats_touched(path: str, col: str, lo, hi) -> dict:
    """(files touched, row groups touched, totals) for lo <= col <= hi
    under min/max-stats pruning."""
    files = sorted(glob.glob(f"{path}/*.parquet"))
    f_touch = rg_touch = rg_total = 0
    for f in files:
        md = pq.ParquetFile(f).metadata
        idx = md.schema.to_arrow_schema().get_field_index(col)
        file_hit = False
        for g in range(md.num_row_groups):
            st = md.row_group(g).column(idx).statistics
            rg_total += 1
            if st is None or st.min is None:  # no stats → must read
                rg_touch += 1
                file_hit = True
                continue
            if not (st.max < lo or st.min > hi):
                rg_touch += 1
                file_hit = True
        f_touch += int(file_hit)
    return {
        "files_touched": f_touch,
        "files_total": len(files),
        "row_groups_touched": rg_touch,
        "row_groups_total": rg_total,
    }


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"

    from pyspark.sql import functions as F

    from frizzle_spark.session import get_spark
    from frizzle_spark.sources.bucketed import write_clustered, write_zordered

    spark = get_spark("layout-pruning-bench")
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    lo_max = li.agg(F.max("l_orderkey")).collect()[0][0]
    pk_max = li.agg(F.max("l_partkey")).collect()[0][0]

    base = tempfile.mkdtemp(prefix="layouts_")
    plain, ranged, zord = f"{base}/plain", f"{base}/ranged", f"{base}/zorder"
    li.repartition(32).write.parquet(plain)
    write_clustered(li, ranged, ["l_orderkey"], partitions=32)
    write_zordered(
        li,
        zord,
        [("l_orderkey", 0.0, float(lo_max)), ("l_partkey", 0.0, float(pk_max))],
        partitions=32,
    )

    # ~1%-of-domain range predicates on each clustered column
    ok_lo, ok_hi = int(lo_max * 0.40), int(lo_max * 0.41)
    pk_lo, pk_hi = int(pk_max * 0.40), int(pk_max * 0.41)
    try:
        out: dict = {"sf_dir": sf_dir, "n_rows": li.count(), "layouts": {}}
        for name, path in (("plain", plain), ("ranged", ranged), ("zorder", zord)):
            out["layouts"][name] = {
                "pred_l_orderkey": stats_touched(path, "l_orderkey", ok_lo, ok_hi),
                "pred_l_partkey": stats_touched(path, "l_partkey", pk_lo, pk_hi),
            }
            # correctness: every layout returns identical counts
            got = (
                spark.read.parquet(path)
                .where(F.col("l_orderkey").between(ok_lo, ok_hi))
                .count()
            )
            out["layouts"][name]["rows_matching_orderkey_pred"] = got
        assert (
            len(
                {
                    v["rows_matching_orderkey_pred"]
                    for v in out["layouts"].values()
                }
            )
            == 1
        )
        print(json.dumps(out))
    finally:
        shutil.rmtree(base, ignore_errors=True)


if __name__ == "__main__":
    main()
