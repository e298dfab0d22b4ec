"""Differential tests: every registered query with an oracle hash-matches
DuckDB on the driver testdata (the t2 contract, SURVEY.md §5)."""

from __future__ import annotations

import pytest

import frizzle_spark.plans.relational  # noqa: F401 - populate registry
import frizzle_spark.plans.windows  # noqa: F401
import frizzle_spark.plans.text_queries  # noqa: F401
import frizzle_spark.operators.dedup  # noqa: F401
import frizzle_spark.operators.similarity  # noqa: F401
import frizzle_spark.operators.graph  # noqa: F401
import frizzle_spark.plans.streaming_queries  # noqa: F401
import frizzle_spark.plans.multimodal_queries  # noqa: F401
import frizzle_spark.plans.joins_extra  # noqa: F401
import frizzle_spark.plans.udf_queries  # noqa: F401
import frizzle_spark.plans.sql_surface  # noqa: F401
from frizzle_spark.plans.registry import REGISTRY

from tests.oracle import assert_matches


def _oracle_cases():
    return [(name, spec) for name, spec in sorted(REGISTRY.items()) if spec.oracle]


@pytest.mark.parametrize("name", [n for n, _ in _oracle_cases()])
def test_oracle_match(spark, sf_dir, name):
    spec = REGISTRY[name]
    df = spec.fn(spark, sf_dir)
    assert_matches(df, spec.oracle, sf_dir)


@pytest.mark.parametrize("name", sorted(REGISTRY))
def test_runs_nonempty_schema(spark, sf_dir, name):
    df = REGISTRY[name].fn(spark, sf_dir)
    assert df.columns, f"{name} returned no columns"


def test_approx_distinct_tolerance(spark, sf_dir):
    approx = {
        r["o_orderstatus"]: r["n_customers_approx"]
        for r in REGISTRY["qz9_approx_distinct"].fn(spark, sf_dir).collect()
    }
    exact = {
        r["o_orderstatus"]: r["n_customers"]
        for r in REGISTRY["q9_distinct"].fn(spark, sf_dir).collect()
    }
    for k, v in exact.items():
        assert abs(approx[k] - v) <= max(2, 0.05 * v), (k, approx[k], v)


def test_hll_mergeable_accuracy_and_merge_identity(spark, sf_dir):
    """qz9_hll_mergeable: per-scope estimates within 5% of exact, and
    the defining property — the ALL row built by MERGING per-type
    sketches must equal sketching the whole table directly (sketch
    union ≡ data union; re-aggregation without rescanning)."""
    from pyspark.sql import functions as F

    from frizzle_spark.sources.tables import load_table

    got = {
        r["scope"]: (r["approx_users"], r["n_events"])
        for r in REGISTRY["qz9_hll_mergeable"].fn(spark, sf_dir).collect()
    }
    ev = load_table(spark, sf_dir, "events")
    exact = {
        r["event_type"]: r["n"]
        for r in ev.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    exact["ALL"] = ev.select("user_id").distinct().count()
    for scope, n in exact.items():
        assert abs(got[scope][0] - n) <= max(2, 0.05 * n), (scope, got[scope], n)
    assert got["ALL"][1] == ev.count()
    direct = ev.agg(
        F.hll_sketch_estimate(F.hll_sketch_agg("user_id")).alias("n")
    ).collect()[0]["n"]
    assert got["ALL"][0] == direct, "sketch-merge must equal direct sketching"


def test_approx_percentile_tolerance(spark, sf_dir):
    exact = {
        r["event_type"]: (r["p50"], r["p90"])
        for r in REGISTRY["q9_percentiles"].fn(spark, sf_dir).collect()
    }
    approx = {
        r["event_type"]: (r["p50_approx"], r["p90_approx"])
        for r in REGISTRY["qz9_approx_percentiles"].fn(spark, sf_dir).collect()
    }
    for k, (p50, p90) in exact.items():
        a50, a90 = approx[k]
        spread = max(abs(p90), 1.0)
        assert abs(a50 - p50) <= 0.05 * spread, (k, p50, a50)
        assert abs(a90 - p90) <= 0.05 * spread, (k, p90, a90)


def test_heavy_hitters_exact_at_test_scale(spark, sf_dir):
    """The vocabulary fits inside HH_TRACKED, so the sketch must be
    exact: every reported count equals the exact count, and every
    strict heavy hitter (exact count above the exact K-th count) is
    reported — tie order at the K boundary is engine-defined and not
    asserted."""
    from pyspark.sql import functions as F

    from frizzle_spark.plans.text_queries import HH_K

    got = {
        r["word"]: r["n"]
        for r in REGISTRY["qz9_heavy_hitters"].fn(spark, sf_dir).collect()
    }
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    exact = {
        r["w"]: r["n"]
        for r in docs.select(
            F.explode(F.split(F.trim("text"), r"\s+")).alias("w")
        )
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert len(got) == min(HH_K, len(exact))
    for w, n in got.items():
        assert exact[w] == n, (w, n, exact.get(w))
    kth = sorted(exact.values(), reverse=True)[min(HH_K, len(exact)) - 1]
    strict = {w for w, n in exact.items() if n > kth}
    assert strict <= set(got), f"missing strict heavy hitters: {strict - set(got)}"


def test_stratified_sample_fractions(spark, sf_dir):
    from pyspark.sql import functions as F

    from frizzle_spark.plans.sql_surface import SAMPLE_FRACTIONS

    totals = {
        r["event_type"]: r["n"]
        for r in spark.read.parquet(f"{sf_dir}/events.parquet")
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
        if r["event_type"] in SAMPLE_FRACTIONS
    }
    kept = {
        r["event_type"]: r["n_kept"]
        for r in REGISTRY["qz22_stratified_sample"].fn(spark, sf_dir).collect()
    }
    for etype, frac in SAMPLE_FRACTIONS.items():
        got = kept.get(etype, 0) / totals[etype]
        if frac == 1.0:
            assert got == 1.0, (etype, got)
        else:
            assert abs(got - frac) <= 0.06, (etype, got, frac)


def test_drift_flags_planted_shift(spark, tmp_path):
    """qz23_drift must separate a stream whose value distribution
    SHIFTS between halves (planted: mean jumps 50 in half 2) from a
    stationary one — the standard PSI reading: <0.1 stable, >0.25
    action-worthy."""
    import datetime as dt

    from pyspark.sql import functions as F

    rows = []
    t0 = dt.datetime(2026, 1, 1)
    for i in range(4000):
        ts = t0 + dt.timedelta(minutes=i * 10)
        half2 = i >= 2000
        rows.append((i, ts, "stable", 1, float(50 + (i * 7919) % 100) / 2, "{}"))
        rows.append(
            (
                10_000 + i,
                ts,
                "drifting",
                1,
                float(((i * 104729) % 100) / 2 + (75 if half2 else 0)),
                "{}",
            )
        )
    out = str(tmp_path / "corpus")
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, event_type string, user_id long,"
        " value double, props string",
    ).withColumn("ts", F.col("ts").cast("timestamp_ntz")).write.mode(
        "overwrite"
    ).parquet(f"{out}/events.parquet")

    psi = {
        r["event_type"]: r["psi"]
        for r in REGISTRY["qz23_drift"].fn(spark, out).collect()
    }
    assert psi["stable"] < 0.1, psi
    assert psi["drifting"] > 0.25, psi
    assert psi["drifting"] > 5 * psi["stable"], psi


def test_cdc_merge_all_four_outcomes(spark, tmp_path):
    """qz17_cdc_merge on a corpus built to hit every branch: unchanged,
    updated, deleted (latest=error), and inserted (changelog key absent
    from the snapshot)."""
    import datetime as dt

    t0 = dt.datetime(2026, 1, 1)
    events = [
        # user 1: two changes, latest updates balance to 42.0
        (1, t0, "click", 1, 7.0, "{}"),
        (2, t0 + dt.timedelta(hours=1), "view", 1, 42.0, "{}"),
        # user 2: latest is error → delete
        (3, t0, "view", 2, 9.0, "{}"),
        (4, t0 + dt.timedelta(hours=1), "error", 2, 0.0, "{}"),
        # user 99: not in snapshot → insert
        (5, t0, "signup", 99, 5.5, "{}"),
    ]
    out = str(tmp_path / "corpus")
    from pyspark.sql import functions as F

    spark.createDataFrame(
        events,
        "event_id long, ts timestamp, event_type string, user_id long,"
        " value double, props string",
    ).withColumn("ts", F.col("ts").cast("timestamp_ntz")).write.parquet(
        f"{out}/events.parquet"
    )
    spark.createDataFrame(
        [(1, "Alice", 10.0), (2, "Bob", 20.0), (3, "Carol", 30.0)],
        "c_custkey long, c_name string, c_acctbal double",
    ).write.parquet(f"{out}/customer.parquet")

    rows = {r["key"]: r for r in REGISTRY["qz17_cdc_merge"].fn(spark, out).collect()}
    assert rows[1]["change"] == "updated" and rows[1]["balance"] == 42.0
    assert 2 not in rows, "latest=error must delete the key"
    assert rows[3]["change"] == "unchanged" and rows[3]["balance"] == 30.0
    assert rows[99]["change"] == "inserted" and rows[99]["balance"] == 5.5
    assert rows[99]["c_name"] is None


def test_weighted_sample_heavy_doc_always_included(spark, tmp_path):
    """A-Res law: a document whose weight dwarfs the rest is (for any
    fixed seed, deterministically) in the sample — its key ln(u)/w sits
    at ~-1e-9 while unit-weight keys sit near -1."""
    out = str(tmp_path / "wcorpus")
    rows = [(i, f"text {i}", "en", "src", 1) for i in range(300)]
    rows.append((9999, "whale", "en", "src", 10**9))
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.parquet(f"{out}/documents.parquet")
    got = {r["doc_id"] for r in REGISTRY["qz22_weighted_sample"].fn(spark, out).collect()}
    assert 9999 in got
    assert len(got) == 200


def test_correlation_exact_linear_series(spark, tmp_path):
    """y = 2x + 5 exactly (in cents) ⇒ corr 1.0 and slope 2·cents after
    rounding; a sign-flipped stream gives corr -1.  Pins the moment
    algebra end-to-end on data where the answer is closed-form."""
    import datetime as dt

    out = str(tmp_path / "ccorpus")
    t0 = dt.datetime(2024, 1, 1)
    ev = []
    for i in range(100):
        ts = t0 + dt.timedelta(seconds=i * 60)
        ev.append((i, ts, 1, "up", (2 * (i * 60) + 5) / 100.0, "{}"))
        ev.append((1000 + i, ts, 2, "down", (-3 * (i * 60) + 7) / 100.0, "{}"))
    from pyspark.sql import functions as F

    spark.createDataFrame(
        ev,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    ).withColumn("ts", F.col("ts").cast("timestamp_ntz")).write.parquet(
        f"{out}/events.parquet"
    )
    rows = {r["event_type"]: r for r in REGISTRY["qz23_correlation"].fn(spark, out).collect()}
    assert rows["up"]["corr_xy"] == 1.0 and rows["up"]["slope"] == 2.0
    assert rows["down"]["corr_xy"] == -1.0 and rows["down"]["slope"] == -3.0
