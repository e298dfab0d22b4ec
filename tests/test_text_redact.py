"""PII redaction: synthetic golden cases + a DuckDB differential over the
corpus built from the SAME regex constants (the qz14_redact registry
entry is rows-only for the driver, so the hash check lives here)."""

from __future__ import annotations

from pyspark.sql import functions as F

import frizzle_spark.plans.text_queries  # noqa: F401 - populates REGISTRY
from frizzle_spark.functions import text as T
from frizzle_spark.plans.registry import REGISTRY
from tests.oracle import assert_matches


def test_redact_golden_cases(spark):
    rows = [
        (1, "contact me at jane.doe+spam@example.co.uk for details"),
        (2, "call +1-555-123-4567 or 555 123 4567 today"),
        (3, "server at 192.168.0.1 responded"),
        (4, "nothing sensitive here at all"),
        (5, "mixed: bob@x.io / 10.0.0.255 / +44-555-987-6543"),
    ]
    df = spark.createDataFrame(rows, ["id", "t"])
    got = {
        r["id"]: r["red"]
        for r in df.select("id", T.redact_pii(F.col("t")).alias("red")).collect()
    }
    assert got[1] == "contact me at <EMAIL> for details"
    assert got[2] == "call <PHONE> or <PHONE> today"
    assert got[3] == "server at <IP> responded"
    assert got[4] == "nothing sensitive here at all"
    assert got[5] == "mixed: <EMAIL> / <IP> / <PHONE>"


def test_redact_corpus_matches_duckdb(spark, sf_dir):
    oracle = f"""
    SELECT doc_id,
           md5(regexp_replace(regexp_replace(regexp_replace(text,
               '{T.EMAIL_RE}', '<EMAIL>', 'g'),
               '{T.PHONE_RE}', '<PHONE>', 'g'),
               '{T.IPV4_RE}', '<IP>', 'g')) AS redacted_fp,
           CAST(regexp_replace(regexp_replace(regexp_replace(text,
               '{T.EMAIL_RE}', '<EMAIL>', 'g'),
               '{T.PHONE_RE}', '<PHONE>', 'g'),
               '{T.IPV4_RE}', '<IP>', 'g') <> text AS BIGINT) AS was_redacted
    FROM documents
    """
    assert_matches(REGISTRY["qz14_redact"].fn(spark, sf_dir), oracle, sf_dir)


def test_unigram_logprob_separates_fluent_from_gibberish(spark, tmp_path):
    """The LM score must order documents sensibly: text made of the
    corpus' common words scores higher (less negative) than
    out-of-vocabulary gibberish — the property quality filters rely on."""
    from frizzle_spark.plans.registry import REGISTRY

    common = "the data pipeline reads the data and writes the data " * 20
    fluent = "the pipeline reads and writes data " * 10
    gibberish = "zqxv kjwpf mbrtt ylonq hgfds " * 12
    out = str(tmp_path / "corpus")
    spark.createDataFrame(
        [
            (0, common, "en", "src0", len(common)),
            (1, fluent, "en", "src0", len(fluent)),
            (2, gibberish, "en", "src0", len(gibberish)),
        ],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).write.mode("overwrite").parquet(f"{out}/documents.parquet")
    got = {
        r["doc_id"]: r["avg_logprob"]
        for r in REGISTRY["qz14_unigram_logprob"].fn(spark, out).collect()
    }
    assert got[1] > got[2], got
    assert got[0] > got[2], got


def test_markup_extract_on_planted_html(spark, tmp_path):
    """qz14_markup_extract on real markup: tags stripped, markup volume
    counted, links extracted in document order; prose untouched."""
    from frizzle_spark.plans.registry import REGISTRY

    html = (
        '<html><body class="x"><h1>Title</h1><p>Real prose here with '
        '<a href="https://example.com/a">a link</a> and '
        '<a href="http://other.net/b?q=1">another</a>.</p></body></html>'
    )
    prose = "Just plain prose, see https://plain.example.org/doc for more."
    out = str(tmp_path / "corpus")
    spark.createDataFrame(
        [(0, html, "en", "src0", len(html)), (1, prose, "en", "src0", len(prose))],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).write.mode("overwrite").parquet(f"{out}/documents.parquet")
    got = {
        r["doc_id"]: r
        for r in REGISTRY["qz14_markup_extract"].fn(spark, out).collect()
    }
    assert got[0]["markup_chars"] > 80, got[0]
    assert list(got[0]["links"]) == [
        "https://example.com/a",
        "http://other.net/b?q=1",
    ]
    assert got[1]["markup_chars"] == 0
    assert list(got[1]["links"]) == ["https://plain.example.org/doc"]

    from frizzle_spark.functions import text as T
    import pyspark.sql.functions as F

    clean = (
        spark.read.parquet(f"{out}/documents.parquet")
        .where(F.col("doc_id") == 0)
        .select(T.strip_markup(F.col("text")).alias("c"))
        .collect()[0]["c"]
    )
    assert "<" not in clean and "Title" in clean and "Real prose" in clean
