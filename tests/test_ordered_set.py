"""Edge gates for the ordered-set family (plans/ordered_set.py).

The happy path is fully oracle-swept by test_relational's parametrized
differential; these pin the corners the selective-bin algorithm could
get wrong: degenerate (min==max) groups, tie-heavy distributions that
straddle bin edges, and empty input.
"""

from __future__ import annotations

import math

import pandas as pd
import pytest

from frizzle_spark.plans.registry import REGISTRY


def _write_events(spark, tmp_path, rows):
    out = str(tmp_path / "corpus")
    pdf = pd.DataFrame(
        rows, columns=["event_id", "ts", "user_id", "event_type", "value"]
    )
    pdf["props"] = None
    df = spark.createDataFrame(
        pdf,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props map<string,string>",
    )
    df.write.mode("overwrite").parquet(f"{out}/events.parquet")
    return out


def _quantiles_brute(values, ps=(0.25, 0.50, 0.75, 0.90)):
    s = sorted(values)
    n = len(s)
    return [s[int(math.ceil(p * n)) - 1] for p in ps]


def test_degenerate_constant_group(spark, tmp_path):
    ts = pd.Timestamp("2024-01-01")
    rows = [(i, ts, 1, "const", 42.5) for i in range(10)]
    rows += [(100 + i, ts, 1, "vary", float(i)) for i in range(1, 101)]
    out = _write_events(spark, tmp_path, rows)
    got = {
        r["event_type"]: r
        for r in REGISTRY["qz28_quantile_2pass"].fn(spark, out).collect()
    }
    assert got["const"]["p25_disc"] == 42.5
    assert got["const"]["p90_disc"] == 42.5
    want = _quantiles_brute([float(i) for i in range(1, 101)])
    assert [
        got["vary"][c]
        for c in ("p25_disc", "median_disc", "p75_disc", "p90_disc")
    ] == want


def test_tie_heavy_distribution(spark, tmp_path):
    # 1000 rows over only 3 distinct values: every bin-edge straddle is
    # a tie run, the case the header comment argues is safe
    ts = pd.Timestamp("2024-01-01")
    vals = [1.0] * 300 + [2.0] * 500 + [3.0] * 200
    rows = [(i, ts, 1, "t", v) for i, v in enumerate(vals)]
    out = _write_events(spark, tmp_path, rows)
    got = REGISTRY["qz28_quantile_2pass"].fn(spark, out).collect()[0]
    want = _quantiles_brute(vals)
    assert [
        got[c] for c in ("p25_disc", "median_disc", "p75_disc", "p90_disc")
    ] == want


def test_empty_events_totality(spark, tmp_path):
    out = _write_events(spark, tmp_path, [])
    assert REGISTRY["qz28_quantile_2pass"].fn(spark, out).count() == 0
    assert REGISTRY["qz28_ordered_set_aggs"].fn(spark, out).count() == 0


def test_single_row_group(spark, tmp_path):
    ts = pd.Timestamp("2024-01-01")
    out = _write_events(spark, tmp_path, [(0, ts, 1, "solo", 7.25)])
    got = REGISTRY["qz28_quantile_2pass"].fn(spark, out).collect()[0]
    assert (
        got["p25_disc"]
        == got["median_disc"]
        == got["p75_disc"]
        == got["p90_disc"]
        == 7.25
    )
    assert got["n"] == 1
