"""Property-based tests (hypothesis) — what the reference's example-based
matrix (transform_test.go:14-56) proves for 4 fixed strings, proved here
for arbitrary payloads; plus algebraic laws for the skew operators.

Each property collects its hypothesis examples into ONE DataFrame and
runs a single Spark job — example generation is driver-side, so the
suite stays fast.
"""

from __future__ import annotations

from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from frizzle_spark.streaming.transforms import sep_transformer

SEPS = [b"\n", b"|", b"::"]


def _apply(spark, payloads: list[bytes], sep: bytes, which: str) -> list[bytes]:
    t = sep_transformer(sep)
    df = spark.createDataFrame(
        [(str(i), p) for i, p in enumerate(payloads)], "id string, data binary"
    )
    out = (t.send if which == "send" else t.receive)(df)
    rows = out.orderBy(F.col("id").cast("int")).collect()
    return [bytes(r["data"]) for r in rows]


@settings(max_examples=5, deadline=None)
@given(
    payloads=st.lists(st.binary(min_size=0, max_size=30), min_size=1, max_size=20),
    sep=st.sampled_from(SEPS),
)
def test_send_appends_iff_absent_and_is_idempotent(spark, payloads, sep):
    sent = _apply(spark, payloads, sep, "send")
    # every sent payload ends with the separator, appended at most once
    for p, s in zip(payloads, sent):
        assert s.endswith(sep)
        assert s == (p if p.endswith(sep) else p + sep)
    # idempotence: send ∘ send = send (transform_test.go's append-iff-absent)
    assert _apply(spark, sent, sep, "send") == sent


@settings(max_examples=5, deadline=None)
@given(
    payloads=st.lists(st.binary(min_size=0, max_size=30), min_size=1, max_size=20),
    sep=st.sampled_from(SEPS),
)
def test_receive_inverts_send(spark, payloads, sep):
    sent = _apply(spark, payloads, sep, "send")
    received = _apply(spark, sent, sep, "receive")
    # receive strips exactly the one trailing separator send guarantees
    for p, r in zip(payloads, received):
        assert r == (p[: -len(sep)] if p.endswith(sep) else p)


@settings(max_examples=5, deadline=None)
@given(
    rows=st.lists(
        st.tuples(st.integers(0, 3), st.integers(-1000, 1000)),
        min_size=1,
        max_size=50,
    ),
    buckets=st.sampled_from([2, 5, 16]),
)
def test_two_phase_agg_equals_plain_agg(spark, rows, buckets):
    from frizzle_spark.operators.skew import two_phase_agg

    df = spark.createDataFrame(rows, "k int, v long")
    plain = {
        (r["k"]): (r["n"], r["s"], r["mn"], r["mx"])
        for r in df.groupBy("k")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("v").alias("s"),
            F.min("v").alias("mn"),
            F.max("v").alias("mx"),
        )
        .collect()
    }
    skewsafe = {
        (r["k"]): (r["n"], r["s"], r["mn"], r["mx"])
        for r in two_phase_agg(
            df,
            ["k"],
            {
                "n": (F.count(F.lit(1)), "sum"),
                "s": (F.sum("v"), "sum"),
                "mn": (F.min("v"), "min"),
                "mx": (F.max("v"), "max"),
            },
            buckets=buckets,
        ).collect()
    }
    assert skewsafe == plain


@settings(max_examples=5, deadline=None)
@given(
    texts=st.lists(
        st.text(
            alphabet=st.characters(min_codepoint=32, max_codepoint=126),
            min_size=0,
            max_size=60,
        ),
        min_size=1,
        max_size=20,
    )
)
def test_redact_pii_is_idempotent_and_tag_free_of_pii(spark, texts):
    """redact ∘ redact = redact, and a redacted text never still matches
    the email pattern (the placeholder tags are PII-shape-free)."""
    from frizzle_spark.functions.text import EMAIL_RE, redact_pii

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "id int, t string"
    )
    once = df.select("id", redact_pii(F.col("t")).alias("r"))
    twice = once.select("id", redact_pii(F.col("r")).alias("r2"), "r")
    rows = twice.orderBy("id").collect()
    assert all(r["r"] == r["r2"] for r in rows), "redaction must be idempotent"
    leftover = once.where(F.regexp_count("r", F.lit(EMAIL_RE)) > 0).count()
    assert leftover == 0


@settings(max_examples=5, deadline=None)
@given(
    rows=st.lists(
        st.tuples(st.integers(0, 9), st.integers(0, 2), st.integers(0, 1_000_000)),
        min_size=1,
        max_size=30,
    )
)
def test_keep_latest_survivor_is_max_ts_per_key(spark, rows):
    """The keep-latest compaction shape: the surviving row per key carries
    that key's maximal (ts, id) — for arbitrary duplicate patterns."""
    from pyspark.sql.window import Window

    df = spark.createDataFrame(rows, "k int, v int, ts long")
    w = Window.partitionBy("k").orderBy(F.desc("ts"), F.desc("v"))
    latest = {
        r["k"]: (r["ts"], r["v"])
        for r in df.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .collect()
    }
    want = {}
    for k, v, ts in rows:
        if k not in want or (ts, v) > want[k]:
            want[k] = (ts, v)
    assert latest == want


@settings(max_examples=50, deadline=None)
@given(data=st.binary(min_size=0, max_size=4096))
def test_cdc_boundaries_invariants(data):
    """For ARBITRARY payloads: cuts strictly increase to exactly len,
    every chunk obeys the max bound, every non-final chunk obeys the
    min bound, and boundaries are a pure function of the bytes.
    (Pure-numpy driver-side property — no Spark job per example.)"""
    from frizzle_spark.operators.chunking import (
        CDC_MAX,
        CDC_MIN,
        cdc_boundaries,
    )

    cuts = cdc_boundaries(data)
    if not data:
        assert cuts == []
        return
    assert cuts[-1] == len(data)
    assert all(a < b for a, b in zip(cuts, cuts[1:]))
    lens = [b - a for a, b in zip([0] + cuts[:-1], cuts)]
    assert all(ln <= CDC_MAX for ln in lens)
    assert all(ln >= CDC_MIN for ln in lens[:-1]) or len(lens) == 1
    assert cdc_boundaries(data) == cuts


@settings(max_examples=25, deadline=None)
@given(
    data=st.binary(min_size=600, max_size=2048),
    prefix=st.binary(min_size=1, max_size=64),
)
def test_cdc_suffix_boundaries_resynchronize(data, prefix):
    """The CDC contract, as a law: prepending arbitrary bytes may only
    disturb a bounded PREFIX of the chunking — once both versions place
    a content-determined cut at the same content position beyond the
    perturbation + one max-chunk + one window span, every later cut is
    identical (shifted by len(prefix)).  Forced-max cuts can delay
    agreement, so the law is asserted from the first shared anchor
    candidate onward."""
    from frizzle_spark.operators.chunking import (
        CDC_MAX,
        CDC_WINDOW,
        cdc_boundaries,
    )

    base = set(cdc_boundaries(data))
    shifted = {c - len(prefix) for c in cdc_boundaries(prefix + data)}
    horizon = len(prefix) + CDC_MAX + CDC_WINDOW
    # anchors: cuts both versions agree on beyond the disturbance horizon
    anchors = sorted(c for c in base & shifted if c > horizon and c < len(data))
    if anchors:
        a = anchors[0]
        assert {c for c in base if c >= a} == {c for c in shifted if c >= a}


def test_incr_agg_boundary_cutoffs(spark, sf_dir, monkeypatch):
    """MV-maintenance law: snapshot ⊕ delta must equal full recompute at
    ANY cutoff — including the degenerate ones (empty snapshot, empty
    delta).  The oracle sweep pins one interior cutoff; this pins both
    edges, where a missing full-outer/coalesce would silently drop
    every group."""
    import frizzle_spark.plans.joins_extra as jx
    from tests.oracle import assert_matches

    for cutoff in ("2020-01-01 00:00:00", "2030-01-01 00:00:00"):
        monkeypatch.setattr(jx, "INCR_CUTOFF", cutoff)
        assert_matches(jx.qz17_incr_agg(spark, sf_dir), jx._INCR_AGG_ORACLE, sf_dir)


@given(
    xs=st.lists(
        st.floats(-1e6, 1e6, allow_nan=False, allow_infinity=False),
        min_size=1,
        max_size=200,
    ),
    k=st.floats(0, 100, allow_nan=False),
)
@settings(max_examples=200, deadline=None)
def test_cusum_closed_form_equals_recursion(xs, k):
    """qz23_cusum rests on the prefix-scan rewrite of the clamped
    recursion (plans/sql_surface.py header): S_t = C_t − min(0,
    min_{j≤t} C_j) must equal S_t = max(0, S_{t−1} + D_t) EXACTLY —
    same float ops in the same order is not guaranteed, but the
    identity is algebraic so agreement must hold to strict tolerance
    for any drift-adjusted series."""
    import numpy as np

    d = np.asarray(xs, dtype=np.float64) - k
    # recursive reference
    s, out_rec = 0.0, []
    for v in d:
        s = max(0.0, s + v)
        out_rec.append(s)
    # closed form as the query computes it
    c = np.cumsum(d)
    out_closed = c - np.minimum(0.0, np.minimum.accumulate(c))
    assert np.allclose(out_rec, out_closed, rtol=1e-9, atol=1e-6)


@given(
    xs=st.lists(
        st.floats(-1e6, 1e6, allow_nan=False, allow_infinity=False),
        min_size=1,
        max_size=200,
    ),
    k=st.floats(0, 100, allow_nan=False),
)
@settings(max_examples=200, deadline=None)
def test_cusum_negative_side_closed_form(xs, k):
    """Downward-shift side: S⁻_t = max(0, S⁻_{t−1} − D'_t) with
    D' = x − μ + κ must equal max(0, max_{j≤t} C'_j) − C'_t."""
    import numpy as np

    d = np.asarray(xs, dtype=np.float64) + k
    s, out_rec = 0.0, []
    for v in d:
        s = max(0.0, s - v)
        out_rec.append(s)
    c = np.cumsum(d)
    out_closed = np.maximum(0.0, np.maximum.accumulate(c)) - c
    assert np.allclose(out_rec, out_closed, rtol=1e-9, atol=1e-6)


def test_band_join_bucket_accounting_on_adversarial_prices(spark, tmp_path):
    """qz16_band_join's exactly-once pair accounting (same-bucket key
    order + adjacent-bucket origin rule) on a corpus DESIGNED to stress
    it: negative prices (floor() of negatives), values exactly on
    bucket boundaries, exact duplicates, and clusters denser than δ.
    Brute-force DuckDB over the same table is the oracle."""
    import duckdb

    from frizzle_spark.plans.joins_extra import BAND_DELTA
    from frizzle_spark.plans.registry import REGISTRY

    import numpy as np

    rng = np.random.RandomState(7)
    vals = np.concatenate(
        [
            rng.uniform(-1.0, 1.0, 60),  # negatives straddling zero
            np.arange(-5, 5) * BAND_DELTA,  # exact bucket boundaries
            np.full(5, 3.7),  # exact duplicates
            3.7 + rng.uniform(-BAND_DELTA, BAND_DELTA, 20),  # dense cluster
        ]
    )
    rows = [
        (int(i), f"part{i}", f"B{i % 3}", "TYPE", 1, float(v))
        for i, v in enumerate(vals)
    ]
    df = spark.createDataFrame(
        rows, "p_partkey long, p_name string, p_brand string, p_type string,"
        " p_size int, p_retailprice double"
    )
    base = str(tmp_path / "bandcase")
    import os

    os.makedirs(base)
    df.coalesce(1).write.parquet(f"{base}/part.parquet")

    got = {
        (r["key_a"], r["key_b"])
        for r in REGISTRY["qz16_band_join"].fn(spark, base).collect()
    }
    con = duckdb.connect()
    want = {
        (a, b)
        for a, b in con.execute(
            f"""
            SELECT x.p_partkey, y.p_partkey
            FROM '{base}/part.parquet/*.parquet' x
            JOIN '{base}/part.parquet/*.parquet' y
              ON abs(x.p_retailprice - y.p_retailprice) <= {BAND_DELTA!r}
             AND x.p_partkey < y.p_partkey
             AND x.p_brand <> y.p_brand
            """
        ).fetchall()
    }
    assert got == want, (
        f"missing={sorted(want - got)[:5]} extra={sorted(got - want)[:5]}"
    )
