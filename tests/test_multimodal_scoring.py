"""Multimodal binary-column plumbing and distributed P/R scoring."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from rdfa_streaming_parser_js_spark.operators.extract import extract_triples
from rdfa_streaming_parser_js_spark.operators.multimodal import (
    decode_media_meta, resize_images, sample_frames, synthesize_media,
    _decode_payload)
from rdfa_streaming_parser_js_spark.operators.scoring import (
    false_negatives, false_positives, triple_pr)
from rdfa_streaming_parser_js_spark.sources.pages import (
    expected_triples_df, pages_from_documents)

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF_DIR}/documents.parquet").cache()


@pytest.fixture(scope="module")
def media(spark, docs):
    return synthesize_media(docs).cache()


def test_media_schema_and_decode_roundtrip(spark, media, docs):
    assert dict(media.dtypes)["payload"] == "binary"
    n = docs.count()
    dec = decode_media_meta(media)
    rows = dec.collect()
    assert len(rows) == n
    # decoded metadata equals the typed meta struct carried in the table
    joined = (media.select("media_id", "media_type", "meta.*")
              .join(dec.withColumnRenamed("media_type", "dec_type")
                    .withColumnRenamed("width", "dec_w")
                    .withColumnRenamed("height", "dec_h")
                    .withColumnRenamed("n_frames", "dec_nf"), "media_id"))
    bad = joined.filter(
        (F.col("media_type") != F.col("dec_type"))
        | (F.col("width") != F.col("dec_w"))
        | (F.col("height") != F.col("dec_h"))
        | (F.col("n_frames") != F.col("dec_nf"))).count()
    assert bad == 0


def test_decode_rejects_real_codecs():
    with pytest.raises(NotImplementedError):
        _decode_payload(b"\x89PNG\r\n\x1a\n....")


def test_resize_preserves_aspect_and_container(spark, media):
    out = resize_images(media, max_side=64).collect()
    assert out  # ~1/3 of docs are images
    for r in out:
        assert max(r.new_width, r.new_height) == 64
        ratio_in = r.width / r.height
        ratio_out = r.new_width / r.new_height
        assert abs(ratio_in - ratio_out) < 0.1
        mtype, w, h, _, _ = _decode_payload(bytes(r.payload))
        assert (mtype, w, h) == ("image", r.new_width, r.new_height)


def test_frame_sampling_fanout(spark, media):
    k = 5
    frames = sample_frames(media, every_k=k)
    per_vid = (frames.groupBy("media_id")
               .agg(F.count(F.lit(1)).alias("n"),
                    F.max("frame_index").alias("max_i")).collect())
    meta = {r.media_id: r.n_frames for r in
            media.filter(F.col("media_type") == "video")
            .select("media_id", "meta.n_frames").collect()}
    assert {r.media_id for r in per_vid} == set(meta)
    for r in per_vid:
        nf = meta[r.media_id]
        assert r.n == (nf + k - 1) // k
        assert r.max_i < nf and r.max_i % k == 0


def test_triple_pr_perfect_and_degraded(spark):
    got = extract_triples(pages_from_documents(spark, SF_DIR)).cache()
    exp = expected_triples_df(spark, SF_DIR).cache()
    pr = triple_pr(got, exp).head()
    assert pr.precision == 1.0 and pr.recall == 1.0
    assert pr.n_expected == pr.n_got == pr.n_common
    assert false_positives(got, exp).count() == 0
    assert false_negatives(got, exp).count() == 0

    # degrade: drop one predicate from got, corrupt another
    degraded = (got.filter(~F.col("pred").endswith("dateCreated"))
                .withColumn("obj_value",
                            F.when(F.col("pred").endswith("wordCount"),
                                   F.lit("-1"))
                            .otherwise(F.col("obj_value"))))
    pr2 = triple_pr(degraded, exp).head()
    assert pr2.recall == round(5 / 7, 6)
    assert pr2.precision == round(5 / 6, 6)
    assert false_negatives(degraded, exp).count() == 2 * pr.n_expected // 7
