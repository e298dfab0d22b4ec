"""Empty-corpus totality: every registry query runs on zero-row tables.

At 100 TB, operators routinely meet empty slices — a new partition, a
filtered-out day, the first snapshot of an index.  A query that crashes
on zero rows (driver collect()[0], numpy reductions on empty arrays,
schema inference over a fileless sink dir) is a pipeline-stopping bug
that no data-bearing test can catch.  Round-6 sweep found and fixed
six: IVF/IVF-PQ/SQ8 training on an empty sample, both streaming-bus
sink readbacks, and the minhash index's partitioned-write readback.
This test pins all 93 at zero failures forever.
"""

from __future__ import annotations

import pyarrow.parquet as pq
import pytest

from frizzle_spark.plans.registry import REGISTRY

TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


@pytest.fixture(scope="module")
def empty_dir(sf_dir, tmp_path_factory):
    out = tmp_path_factory.mktemp("empty_sf")
    for t in TABLES:
        schema = pq.read_schema(f"{sf_dir}/{t}.parquet")
        pq.write_table(schema.empty_table(), str(out / f"{t}.parquet"))
    return str(out)


@pytest.fixture(scope="module")
def null_dir(sf_dir, tmp_path_factory):
    """Content-bearing nullable columns nulled on every other row."""
    import pyarrow as pa

    nullable = {
        "documents": ["text", "lang", "source"],
        "events": ["props"],
        "embeddings": ["embedding"],
    }
    out = tmp_path_factory.mktemp("null_sf")
    for t in TABLES:
        tbl = pq.read_table(f"{sf_dir}/{t}.parquet")
        cols = {}
        for name in tbl.column_names:
            col = tbl.column(name)
            if name in nullable.get(t, []):
                arr = col.to_pylist()
                for i in range(0, tbl.num_rows, 2):
                    arr[i] = None
                col = pa.array(arr, type=tbl.schema.field(name).type)
            cols[name] = col
        schema = pa.schema(
            [pa.field(f.name, f.type, nullable=True) for f in tbl.schema]
        )
        pq.write_table(pa.table(cols, schema=schema), str(out / f"{t}.parquet"))
    return str(out)


@pytest.fixture(scope="module")
def one_row_dir(sf_dir, tmp_path_factory):
    out = tmp_path_factory.mktemp("one_sf")
    for t in TABLES:
        tbl = pq.read_table(f"{sf_dir}/{t}.parquet")
        pq.write_table(tbl.slice(0, 1), str(out / f"{t}.parquet"))
    return str(out)


def _sweep(spark, path):
    fails = []
    for name, spec in sorted(REGISTRY.items()):
        try:
            spec.fn(spark, path).count()
        except Exception as ex:  # noqa: BLE001 - report all, then fail once
            fails.append((name, f"{type(ex).__name__}: {ex}"[:160]))
    assert not fails, fails


def test_every_query_total_on_empty_corpus(spark, empty_dir):
    _sweep(spark, empty_dir)


def test_every_query_total_on_one_row_corpus(spark, one_row_dir):
    """The 1-row edge exercises different failure modes than zero rows:
    degenerate stddev/variance, single-element quantizer training,
    self-join emptiness — all must degrade, not crash."""
    _sweep(spark, one_row_dir)


@pytest.fixture(scope="module")
def dup_dir(sf_dir, tmp_path_factory):
    """Every table = its first row repeated 200x: duplicate KEYS and
    content everywhere — the degenerate-skew edge."""
    import pyarrow as pa

    out = tmp_path_factory.mktemp("dup_sf")
    for t in TABLES:
        tbl = pq.read_table(f"{sf_dir}/{t}.parquet")
        one = tbl.slice(0, 1)
        pq.write_table(pa.concat_tables([one] * 200), str(out / f"{t}.parquet"))
    return str(out)


def test_every_query_total_on_duplicate_heavy_corpus(spark, dup_dir):
    """All-identical rows (duplicate keys, duplicate content, zero
    variance): dedup families collapse to one survivor, stddev goes
    null, every self-join is maximal — nothing may crash."""
    _sweep(spark, dup_dir)


def test_every_query_total_on_null_heavy_corpus(spark, null_dir):
    """Half the content columns NULL: the round-6 sweep found 14
    kernel/training crashes (None in Arrow batches, ragged numpy
    stacks).  Policy now enforced at the boundaries — null embeddings
    leave the similarity corpus, null text leaves the media/chunking
    tables (oracles filter identically) — so the registry must stay
    total under nulls."""
    _sweep(spark, null_dir)
