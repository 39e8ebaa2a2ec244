"""Multimodal column plumbing: payload/metadata conventions + stubbed decode
(Arrow-batched mapInPandas — the production batch shape, fake inner decoder)."""

from pyspark.sql import functions as F

from siddhi_io_cdc_spark.functions.multimodal import (
    attach_payload,
    decode_image_features,
    extract_embedding,
    sample_frames,
)


def test_attach_and_decode_deterministic(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(8)
    mm = attach_payload(docs, "text", modality="image")
    assert dict(mm.dtypes)["payload"] == "binary"
    feats = decode_image_features(mm).orderBy("id")
    rows = feats.collect()
    assert len(rows) == 8
    for r in rows:
        assert 16 <= r["width"] < 80 and 16 <= r["height"] < 80
        assert 0 <= r["mean_intensity"] <= 255
    # Deterministic: same input → same features.
    assert feats.collect() == decode_image_features(mm).orderBy("id").collect()


def test_extract_embedding_unit_norm(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(4)
    emb = extract_embedding(attach_payload(docs, "text"), dim=8).collect()
    for r in emb:
        assert len(r["embedding"]) == 8
        assert abs(sum(x * x for x in r["embedding"]) - 1.0) < 1e-3


def test_sample_frames_plan(spark):
    df = spark.createDataFrame([(1,)], "id long").withColumn(
        "mm_meta",
        F.struct(
            F.lit("video").alias("modality"),
            F.lit(None).cast("string").alias("mime"),
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            F.lit(None).cast("int").alias("sample_rate"),
            F.lit(95).alias("n_frames"),
        ),
    )
    idx = [r["frame_idx"] for r in sample_frames(df, every_n=10).collect()]
    assert idx == [0, 10, 20, 30, 40, 50, 60, 70, 80, 90]


def test_audio_features_deterministic_and_batched(spark):
    from siddhi_io_cdc_spark.functions.multimodal import attach_payload, decode_audio_features

    df = spark.createDataFrame([(1, "abcd"), (2, "")], "doc_id long, text string")
    mm = attach_payload(df, "text", modality="audio")
    rows = {r.id: r for r in decode_audio_features(mm, sample_rate=4).collect()}
    assert rows[1].n_samples == 4 and rows[1].duration_s == 1.0 and rows[1].rms > 0
    assert rows[2].n_samples == 0 and rows[2].rms == 0.0
    # Deterministic: same input → identical features on a second run.
    again = {r.id: r.rms for r in decode_audio_features(mm, sample_rate=4).collect()}
    assert again == {k: v.rms for k, v in rows.items()}


def test_frame_sample_then_decode_composes(spark):
    from pyspark.sql import functions as F
    from siddhi_io_cdc_spark.functions.multimodal import (
        attach_payload,
        decode_image_features,
        sample_frames,
    )

    df = spark.createDataFrame([(1, "vid")], "doc_id long, text string")
    mm = attach_payload(df, "text", modality="video").withColumn(
        "mm_meta",
        F.col("mm_meta").withField("n_frames", F.lit(25)),
    )
    frames = sample_frames(mm, every_n=10)
    assert sorted(r.frame_idx for r in frames.collect()) == [0, 10, 20]
    feats = decode_image_features(frames.withColumn("doc_id", F.col("doc_id") * 100 + F.col("frame_idx")))
    assert feats.count() == 3


def test_resize_images_updates_payload_and_meta(spark, sf_dir):
    from siddhi_io_cdc_spark.functions.multimodal import attach_payload, resize_images

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(8)
    mm = attach_payload(docs, "text", modality="image", mime="image/raw")
    out = resize_images(mm, width=4, height=3).collect()
    assert len(out) == 8
    for r in out:
        assert len(r.payload) == 12  # exactly width*height bytes (stub codec)
        assert r.mm_meta.width == 4 and r.mm_meta.height == 3
        assert r.mm_meta.modality == "image"
    # deterministic: same input -> same bytes
    again = resize_images(mm, width=4, height=3).collect()
    assert [bytes(r.payload) for r in out] == [bytes(r.payload) for r in again]
