"""Multimodal plumbing: schemas, batch shapes, fan-out, stub gating."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from hcdc_spark.operators import multimodal as MM
from tests.conftest import assert_matches_oracle


@pytest.fixture(scope="module")
def media(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return MM.media_from_documents(docs).cache()


def test_q42_oracle(spark, oracle, sf_dir):
    spec = MM.REG.specs["q42_media_analyze"]
    assert_matches_oracle(spec.fn(spark, sf_dir), oracle, spec.oracle,
                          spec.name)


def test_media_schema(media):
    assert [f.name for f in media.schema.fields] == [
        "media_id", "kind", "content", "meta",
    ]
    assert dict(media.dtypes)["content"] == "binary"


def test_frame_sampling_fanout(spark, media):
    frames = MM.sample_frames(media, every=2)
    rows = frames.collect()
    assert rows, "no frames sampled"
    by_media = {}
    for r in rows:
        by_media.setdefault(r["media_id"], []).append(r)
    sizes = media.where(F.col("kind") == "video").select(
        "media_id", F.octet_length("content").alias("n")
    ).collect()
    size_of = {r["media_id"]: r["n"] for r in sizes}
    for mid, fr in by_media.items():
        n_frames = math.ceil(size_of[mid] / MM.FRAME_BYTES)
        expect = len(range(0, n_frames, 2))
        assert len(fr) == expect
        # sampled frame indices are 0, 2, 4, ...
        assert sorted(r["frame_idx"] for r in fr) == list(
            range(0, n_frames, 2)
        )[: len(fr)]
        # every frame except possibly the last is exactly FRAME_BYTES
        for r in sorted(fr, key=lambda x: x["frame_idx"])[:-1]:
            assert len(r["frame"]) == MM.FRAME_BYTES


def test_featurize_deterministic(spark, media):
    e1 = {r["media_id"]: r["embedding"]
          for r in MM.featurize_media(media).collect()}
    e2 = {r["media_id"]: r["embedding"]
          for r in MM.featurize_media(media).collect()}
    assert e1 == e2
    assert all(len(v) == 16 for v in e1.values())
    assert all(0.0 <= x <= 1.0 for v in e1.values() for x in v)


def test_real_decode_stub_gated(media):
    try:
        import PIL  # noqa: F401
        pytest.skip("Pillow present; stub path not applicable")
    except ImportError:
        pass
    with pytest.raises(NotImplementedError, match="Pillow"):
        MM.decode_image_real(media)


def test_q43_knn_shape(spark, sf_dir):
    out = MM.REG.specs["q43_media_embed_knn"].fn(spark, sf_dir).collect()
    assert len(out) == 5
    sims = [r["cos_sim"] for r in out]
    assert sims == sorted(sims, reverse=True)


def test_featurize_md5_matches_hand_computation(spark, media):
    """emb[i] = int(md5(payload)[4i:4i+4], 16) / 65535.0 — recomputed
    here independently of the mapInPandas body (the DuckDB oracle for
    q43 re-derives the same arithmetic in SQL)."""
    import hashlib

    rows = media.limit(8).collect()
    got = {
        r["media_id"]: r["embedding"]
        for r in MM.featurize_media_md5(media.limit(8)).collect()
    }
    for r in rows:
        h = hashlib.md5(bytes(r["content"])).hexdigest()
        want = [
            int(h[4 * i : 4 * i + 4], 16) / 65535.0
            for i in range(MM.MD5_EMB_DIM)
        ]
        assert got[r["media_id"]] == want


def test_resize_media_stride_content(spark, sf_dir):
    """The resized payload must be exactly content[::factor] — the
    pytest half of q71 (the oracle covers sizes only)."""
    from hcdc_spark.catalog import load_tables
    from hcdc_spark.operators.multimodal import (
        RESIZE_FACTOR,
        media_from_documents,
        resize_media,
    )

    docs = load_tables(spark, sf_dir, ("documents",))["documents"].limit(30)
    media = media_from_documents(docs)
    want = {
        r["media_id"]: bytes(r["content"])[::RESIZE_FACTOR]
        for r in media.collect()
    }
    got = {
        r["media_id"]: bytes(r["resized"])
        for r in resize_media(media).collect()
    }
    assert got == want and len(got) == 30


def test_q71_matches_oracle(spark, oracle, sf_dir):
    from tests.conftest import assert_matches_oracle

    from hcdc_spark.operators.multimodal import REG

    spec = REG.specs["q71_media_resize"]
    assert_matches_oracle(
        spec.fn(spark, sf_dir), oracle, spec.oracle, spec.name
    )
