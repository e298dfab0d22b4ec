"""Unicode differential sweep: the text-query oracle contract must hold
beyond ASCII.

The driver testdata is ASCII-ish, so the nightly differentials never
exercise the place Spark (java.util.regex over UTF-16) and DuckDB (RE2
over UTF-8) genuinely differ: multibyte code points, RTL scripts,
emoji (surrogate pairs!), repeated accents, pathological whitespace.
Every oracle-backed q14/qz14 query runs here on a corpus built of
exactly those shapes and must hash-match — round 6 measured all 11
matching, so any future pattern change that breaks the shared
java-regex∩RE2 subset trips this instead of shipping silently.
"""

from __future__ import annotations

import pyarrow.parquet as pq
import pytest

import frizzle_spark.plans.text_queries  # noqa: F401 - populate registry
from frizzle_spark.plans.registry import REGISTRY
from tests.oracle import assert_matches

TEXTS = [
    "hello world the and is plain ascii text here",
    "café naïve résumé über straße garçon",  # latin accents
    "日本語のテキスト 中文文本 한국어",  # CJK, no spaces within runs
    "مرحبا بالعالم arabic rtl text",  # RTL mixed with LTR
    "emoji \U0001f600 \U0001f680 mixed ❤️ with text",  # surrogates + VS16
    "tabs\tand\nnewlines  multiple   spaces",
    "a" * 500 + " single long word",
    "é" * 100,
]


@pytest.fixture(scope="module")
def unicode_dir(sf_dir, spark, tmp_path_factory):
    out = tmp_path_factory.mktemp("uni_sf")
    for t in [
        "region",
        "nation",
        "customer",
        "supplier",
        "part",
        "orders",
        "lineitem",
        "events",
        "embeddings",
    ]:
        pq.write_table(
            pq.read_schema(f"{sf_dir}/{t}.parquet").empty_table(),
            str(out / f"{t}.parquet"),
        )
    rows = [(i, t, "en", f"src{i % 3}", len(t)) for i, t in enumerate(TEXTS)]
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.parquet(str(out / "documents.parquet"))
    return str(out)


def _text_oracle_cases():
    return sorted(
        n
        for n, spec in REGISTRY.items()
        if (
            n.startswith("q14")
            or n.startswith("qz14")
            # text-shingle dedup queries read the same documents.text
            # surface and must survive the same unicode corpus
            or n in ("qz11_repeated_ngrams", "qz11_containment")
        )
        and spec.oracle
    )


@pytest.mark.parametrize("name", _text_oracle_cases())
def test_unicode_oracle_match(spark, unicode_dir, name):
    spec = REGISTRY[name]
    assert_matches(spec.fn(spark, unicode_dir), spec.oracle, unicode_dir)
