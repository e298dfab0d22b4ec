from __future__ import annotations

import pytest

from frizzle_spark.functions.multimodal import extract_features_batch, resize_image
from frizzle_spark.plans.multimodal_queries import media_table


def test_resize_stub_raises_cleanly():
    with pytest.raises(NotImplementedError, match="imaging libs"):
        resize_image(b"\x89PNG...", 32, 32)


def test_feature_batch_shape(spark, sf_dir):
    df = media_table(spark, sf_dir).limit(8).mapInPandas(
        extract_features_batch, "doc_id bigint, features array<double>"
    )
    rows = df.collect()
    assert len(rows) == 8
    for r in rows:
        assert len(r["features"]) == 8
        assert abs(sum(r["features"]) - 1.0) < 1e-4  # 8 values each rounded to 6dp
