"""DuckDB differential-oracle harness.

Mirrors the driver's t2 check: run the Spark builder and the oracle SQL on
the same parquet tables, canonicalize (columns sorted by name, rows sorted
by all columns), then compare row count, schema shape and values.  Floats
compare exactly when pre-rounded by the query (the contract) with an
epsilon fallback so a genuine mismatch fails loudly while a last-ulp
boundary shows up as a warning-grade assert message.
"""

from __future__ import annotations

import decimal
import math

import duckdb
import numpy as np
import pandas as pd

from frizzle_spark.sources.tables import TABLES


def duck_run(sql: str, sf_dir: str) -> pd.DataFrame:
    import os

    con = duckdb.connect()
    try:
        for t in TABLES:
            p = f"{sf_dir}/{t}.parquet"
            # driver testdata ships single files; Spark-written test
            # corpora are directories of part files — glob those so
            # planted-corpus differentials work against either layout
            src = f"{p}/*.parquet" if os.path.isdir(p) else p
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{src}')"
            )
        return con.execute(sql).df()
    finally:
        con.close()


def canonical(pdf: pd.DataFrame) -> pd.DataFrame:
    pdf = pdf.reindex(sorted(pdf.columns), axis=1)
    for c in pdf.columns:
        if pd.api.types.is_datetime64_any_dtype(pdf[c]):
            s = pd.to_datetime(pdf[c])
            if getattr(s.dtype, "tz", None) is not None:
                s = s.dt.tz_localize(None)
            pdf[c] = s.astype("datetime64[ns]")
        elif pdf[c].dtype == object:
            # duckdb may hand back Decimal / date objects; array columns
            # (Spark toPandas → ndarray, duckdb → ndarray) become tuples
            # so the all-columns row sort and equals() are well-defined
            def norm(v):
                if isinstance(v, decimal.Decimal):
                    return float(v)
                if isinstance(v, (np.ndarray, list)):
                    return tuple(norm(x) for x in v)
                return v

            pdf[c] = pdf[c].map(norm)
    if len(pdf):
        pdf = pdf.sort_values(by=list(pdf.columns), kind="mergesort").reset_index(drop=True)
    return pdf


def assert_matches(spark_df, oracle_sql: str, sf_dir: str, rtol: float = 1e-9) -> None:
    got = canonical(spark_df.toPandas())
    want = canonical(duck_run(oracle_sql, sf_dir))
    assert sorted(got.columns) == sorted(want.columns), (
        f"column mismatch: spark={sorted(got.columns)} duckdb={sorted(want.columns)}"
    )
    assert len(got) == len(want), f"row count: spark={len(got)} duckdb={len(want)}"
    for c in got.columns:
        g, w = got[c], want[c]
        if pd.api.types.is_float_dtype(g) or pd.api.types.is_float_dtype(w):
            ga = g.astype(float).to_numpy()
            wa = w.astype(float).to_numpy()
            both_nan = np.isnan(ga) & np.isnan(wa)
            close = np.isclose(ga, wa, rtol=rtol, atol=1e-9) | both_nan
            if not close.all():
                bad = int((~close).sum())
                idx = int(np.argmax(~close))
                raise AssertionError(
                    f"column {c!r}: {bad} value mismatches, e.g. row {idx}: "
                    f"spark={ga[idx]!r} duckdb={wa[idx]!r}"
                )
            # exact-hash prediction: the driver hashes raw values
            exact = (ga == wa) | both_nan
            assert exact.all(), (
                f"column {c!r}: values within tolerance but NOT bit-equal "
                f"(driver hash would fail) — round in both queries. "
                f"first diff row {int(np.argmax(~exact))}"
            )
        else:
            eq = g.reset_index(drop=True).equals(w.reset_index(drop=True))
            if not eq:
                diff = (g.to_numpy() != w.to_numpy())
                idx = int(np.argmax(diff))
                raise AssertionError(
                    f"column {c!r} mismatch, e.g. row {idx}: spark={g.iloc[idx]!r} "
                    f"duckdb={w.iloc[idx]!r}"
                )


def _hashable(v):  # pragma: no cover - debug helper
    return str(v) if isinstance(v, float) and math.isnan(v) else v
