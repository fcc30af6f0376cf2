"""Multimodal plumbing tests: schema, batch shape, determinism, stub gate."""

import pytest
from pyspark.sql import functions as F

from datafusion_monoid_spark.operators import multimodal as mm

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def media(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet").limit(50)
    return mm.attach_fake_media(docs)


def test_media_schema_and_metadata(media):
    t = dict(media.dtypes)
    assert t["media"] == "binary"
    assert t["meta"].startswith("struct<format:string,width:int,height:int,n_bytes:bigint")
    rows = media.select(F.length("media").alias("n"), "meta.n_bytes").collect()
    assert all(r["n"] == 16 and r["n_bytes"] == 16 for r in rows)


def test_decode_features_shape_and_determinism(media):
    f1 = {r["doc_id"]: r["features"] for r in mm.decode_features(media).collect()}
    f2 = {r["doc_id"]: r["features"] for r in
          mm.decode_features(media.repartition(7)).collect()}
    assert len(f1) == 50
    for k, v in f1.items():
        assert len(v) == mm.N_FEATURES
        assert abs(sum(v) - 1.0) < 1e-5          # L1-normalized histogram
        assert f2[k] == v                         # partitioning-invariant


def test_real_decoder_is_stubbed(media):
    import pytest as _pytest
    with _pytest.raises(Exception) as ei:
        mm.decode_features(media, decoder="pil").collect()
    assert "NotImplementedError" in str(ei.value) or isinstance(
        ei.value, NotImplementedError)


def test_frame_sample(media):
    frames = mm.frame_sample(media, stride=2)
    rows = frames.where(F.col("doc_id") == frames.select("doc_id").first()[0]).collect()
    # 16 bytes / 4 per frame = 4 frames, stride 2 -> indices 0 and 2
    assert sorted(r["frame_idx"] for r in rows) == [0, 2]
    assert all(len(bytes(r["frame"])) == mm.FRAME_BYTES for r in rows)
