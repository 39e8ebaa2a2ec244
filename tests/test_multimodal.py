"""Multimodal column plumbing: payload/metadata conventions + decode.

Real pure-numpy decoders (binary netpbm P5/P6, uncompressed BMP) over
Arrow-batched mapInPandas — the production batch shape; the deterministic
fake only handles unknown codecs."""

import struct

import numpy as np
import pytest
from pyspark.sql import functions as F

from siddhi_io_cdc_spark.functions.multimodal import (
    attach_payload,
    attach_ppm_payload,
    decode_image_features,
    encode_ppm,
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


def _bmp_24(pixels_bgr: np.ndarray) -> bytes:
    """Minimal uncompressed 24-bit BMP writer (test-local) — rows padded to
    4 bytes, bottom-up, BITMAPINFOHEADER."""
    h, w, _ = pixels_bgr.shape
    stride = (w * 3 + 3) & ~3
    raster = b"".join(
        pixels_bgr[r].astype(np.uint8).tobytes().ljust(stride, b"\x00")
        for r in range(h)
    )
    data_off = 14 + 40
    header = struct.pack("<2sIHHI", b"BM", data_off + len(raster), 0, 0, data_off)
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(raster), 0, 0, 0, 0)
    return header + info + raster


def _decode_one(spark, payload: bytes):
    df = spark.createDataFrame([(1, bytearray(payload))], "doc_id long, payload binary")
    return decode_image_features(df).first()


def test_decode_p5_exact(spark):
    rng = np.random.default_rng(7)
    img = rng.integers(0, 256, size=(11, 17), dtype=np.uint8)
    r = _decode_one(spark, encode_ppm(img))
    assert (r["width"], r["height"]) == (17, 11)
    assert r["mean_intensity"] == pytest.approx(float(img.mean()), abs=1e-6)


def test_decode_p6_exact_and_comments(spark):
    rng = np.random.default_rng(11)
    img = rng.integers(0, 256, size=(5, 9, 3), dtype=np.uint8)
    payload = encode_ppm(img)
    # Inject a header comment — the parser must skip it.
    payload = payload.replace(b"P6\n", b"P6\n# test comment\n", 1)
    r = _decode_one(spark, payload)
    assert (r["width"], r["height"]) == (9, 5)
    assert r["mean_intensity"] == pytest.approx(float(img.mean()), abs=1e-6)


def test_decode_bmp_exact(spark):
    rng = np.random.default_rng(13)
    img = rng.integers(0, 256, size=(6, 5, 3), dtype=np.uint8)  # odd width → padding
    r = _decode_one(spark, _bmp_24(img))
    assert (r["width"], r["height"]) == (5, 6)
    assert r["mean_intensity"] == pytest.approx(float(img.mean()), abs=1e-6)


def test_decode_truncated_netpbm_nulls_by_default_raises_in_strict(spark):
    """Malformed payload (good magic, truncated raster): default tolerant
    mode nulls the features for that row only; strict=True restores the hard
    per-payload error. Healthy rows in the same batch stay decoded."""
    img = np.zeros((4, 4), dtype=np.uint8)
    bad = encode_ppm(img)[:-3]  # chop the raster
    good = encode_ppm(np.full((2, 3), 9, dtype=np.uint8))
    df = spark.createDataFrame(
        [(1, bytearray(bad)), (2, bytearray(good))], "doc_id long, payload binary"
    )
    rows = {r["id"]: r for r in decode_image_features(df).collect()}
    assert rows[1]["width"] is None and rows[1]["mean_intensity"] is None
    assert (rows[2]["width"], rows[2]["height"], rows[2]["mean_intensity"]) == (3, 2, 9.0)
    with pytest.raises(Exception, match="truncated"):
        decode_image_features(df, strict=True).collect()


def test_decode_malformed_wav_nulls_by_default_raises_in_strict(spark):
    """RIFF magic with a missing fmt/data chunk: nulls by default, raises in
    strict mode; healthy WAV rows in the same batch decode normally."""
    from siddhi_io_cdc_spark.functions.multimodal import (
        decode_audio_features,
        encode_wav,
    )

    bad = b"RIFF" + (36).to_bytes(4, "little") + b"WAVE" + b"JUNK" + bytes(8)
    good = encode_wav(np.full(10, 1000, dtype=np.int16), 8000)
    df = spark.createDataFrame(
        [(1, bytearray(bad), None), (2, bytearray(good), None)],
        "doc_id long, payload binary, mm_meta struct<modality:string,mime:string,"
        "width:int,height:int,sample_rate:int,n_frames:int>",
    )
    rows = {r["id"]: r for r in decode_audio_features(df).collect()}
    assert rows[1]["n_samples"] is None and rows[1]["rms"] is None
    assert rows[2]["n_samples"] == 10 and rows[2]["duration_s"] == round(10 / 8000, 6)
    with pytest.raises(Exception, match="missing fmt/data"):
        decode_audio_features(df, strict=True).collect()


def test_resize_malformed_netpbm_nulls_payload(spark):
    """resize_images on a malformed netpbm: null payload by default."""
    from siddhi_io_cdc_spark.functions.multimodal import resize_images

    bad = encode_ppm(np.zeros((4, 4), dtype=np.uint8))[:-3]
    df = spark.createDataFrame(
        [(1, bytearray(bad), None)],
        "doc_id long, payload binary, mm_meta struct<modality:string,mime:string,"
        "width:int,height:int,sample_rate:int,n_frames:int>",
    )
    assert resize_images(df, width=2, height=2).first()["payload"] is None
    with pytest.raises(Exception, match="truncated"):
        resize_images(df, width=2, height=2, strict=True).collect()


def test_attach_ppm_round_trips_through_real_decoder(spark, sf_dir):
    """attach_ppm_payload builds genuine P5 bytes JVM-side; the real netpbm
    parser must recover the closed-form dims and pixel value exactly."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(20)
    feats = decode_image_features(attach_ppm_payload(docs))
    expect = docs.select(
        F.col("doc_id").alias("id"),
        (F.lit(4) + F.col("doc_id") % 13).cast("int").alias("width"),
        (F.lit(4) + F.col("doc_id") % 7).cast("int").alias("height"),
        (F.lit(1) + F.octet_length("text") % 127).cast("double").alias("mean_intensity"),
    )
    assert sorted(feats.collect()) == sorted(expect.collect())


def test_decode_wav_exact(spark):
    """Real 16-bit PCM WAV round-trip: encode_wav → _parse_wav recovers
    sample count, duration, and rms exactly."""
    from siddhi_io_cdc_spark.functions.multimodal import (
        decode_audio_features,
        encode_wav,
    )

    rng = np.random.default_rng(5)
    samples = rng.integers(-32768, 32768, size=1234, dtype=np.int16)
    payload = encode_wav(samples, sample_rate=16000)
    df = spark.createDataFrame(
        [(7, bytearray(payload), None)],
        "doc_id long, payload binary, mm_meta struct<modality:string,mime:string,"
        "width:int,height:int,sample_rate:int,n_frames:int>",
    )
    r = decode_audio_features(df).first()
    x = samples.astype(np.float64) / 32768.0
    assert r["n_samples"] == 1234
    assert r["duration_s"] == pytest.approx(1234 / 16000, abs=1e-6)
    assert r["rms"] == pytest.approx(float(np.sqrt(np.mean(x * x))), abs=1e-6)


def test_decode_wav_stereo_downmix_and_8bit(spark):
    from siddhi_io_cdc_spark.functions.multimodal import _parse_wav, encode_wav

    # Stereo: interleave L/R; downmix must average.
    left = np.full(100, 1000, dtype=np.int16)
    right = np.full(100, 3000, dtype=np.int16)
    inter = np.empty(200, dtype=np.int16)
    inter[0::2], inter[1::2] = left, right
    stereo = bytearray(encode_wav(inter, sample_rate=8000))
    stereo[22:24] = (2).to_bytes(2, "little")  # fmt channels = 2
    sr, x = _parse_wav(bytes(stereo))
    assert sr == 8000 and x.size == 100
    assert x[0] == pytest.approx(2000 / 32768.0)

    # Non-RIFF payloads still take the deterministic fake path.
    from siddhi_io_cdc_spark.functions.multimodal import decode_audio_features

    df = spark.createDataFrame(
        [(1, bytearray(b"\x80" * 50), None)],
        "doc_id long, payload binary, mm_meta struct<modality:string,mime:string,"
        "width:int,height:int,sample_rate:int,n_frames:int>",
    )
    r = decode_audio_features(df, sample_rate=100).first()
    assert r["n_samples"] == 50 and r["duration_s"] == 0.5 and r["rms"] == 0.0


def test_attach_wav_round_trips_through_real_decoder(spark, sf_dir):
    from siddhi_io_cdc_spark.functions.multimodal import (
        attach_wav_payload,
        decode_audio_features,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(20)
    feats = decode_audio_features(attach_wav_payload(docs))
    expect = docs.select(
        F.col("doc_id").alias("id"),
        (F.lit(1) + F.octet_length("text") % 400).cast("int").alias("n_samples"),
        F.round((F.lit(1) + F.octet_length("text") % 400).cast("double") / 8000, 6)
        .alias("duration_s"),
        (F.abs((F.col("doc_id") % 16) - 8).cast("double") / 16).alias("rms"),
    )
    assert sorted(feats.collect()) == sorted(expect.collect())


def test_resize_netpbm_real_nearest_neighbor(spark):
    """netpbm payloads resample for real: resized output is itself a valid
    P5/P6 whose pixels equal numpy nearest-neighbor indexing."""
    from siddhi_io_cdc_spark.functions.multimodal import (
        _parse_netpbm,
        decode_image_features,
        encode_ppm,
        resize_images,
    )

    rng = np.random.default_rng(17)
    img = rng.integers(0, 256, size=(10, 14), dtype=np.uint8)
    df = spark.createDataFrame(
        [(1, bytearray(encode_ppm(img)), None)],
        "doc_id long, payload binary, mm_meta struct<modality:string,mime:string,"
        "width:int,height:int,sample_rate:int,n_frames:int>",
    )
    out = resize_images(df, width=7, height=5).first()
    assert out["mm_meta"]["width"] == 7 and out["mm_meta"]["height"] == 5
    w, h, px = _parse_netpbm(bytes(out["payload"]))
    assert (w, h) == (7, 5)
    rows = (np.arange(5) * 10 // 5).clip(0, 9)
    cols = (np.arange(7) * 14 // 7).clip(0, 13)
    assert np.array_equal(px.reshape(5, 7), img[rows][:, cols])

    # The resized payload round-trips through the real decoder.
    r = decode_image_features(
        spark.createDataFrame(
            [(2, bytearray(bytes(out["payload"])))], "doc_id long, payload binary"
        )
    ).first()
    assert (r["width"], r["height"]) == (7, 5)


def test_attach_video_round_trips_through_split_and_decoder(spark, sf_dir):
    """attach_video_payload builds genuine concatenated-P5 clips JVM-side;
    split_video_frames slices frames with a binary substring; each frame
    parses through the REAL netpbm decoder with the closed-form features."""
    from siddhi_io_cdc_spark.functions.multimodal import (
        _parse_netpbm,
        attach_video_payload,
        decode_image_features,
        split_video_frames,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").where(F.col("doc_id") < 30)
    clips = attach_video_payload(docs)
    r = clips.select("doc_id", "payload", "mm_meta", F.octet_length("text").alias("tl")).first()
    assert r["mm_meta"]["modality"] == "video"
    n, w, h = (2 + r["doc_id"] % 4, 4 + r["doc_id"] % 13, 4 + r["doc_id"] % 7)
    assert r["mm_meta"]["n_frames"] == n
    # Whole clip = n concatenated frames; frame 0 parses standalone.
    pw, ph, px = _parse_netpbm(bytes(r["payload"]))
    assert (pw, ph) == (w, h) and px[0] == 1 + r["tl"] % 127

    frames = split_video_frames(clips, every_n=2)
    feats = decode_image_features(
        frames.select(
            (F.col("doc_id") * 100 + F.col("frame_idx")).alias("fid"),
            F.col("frame_payload").alias("payload"),
        ),
        id_col="fid",
    )
    rows = {r["id"]: r for r in feats.collect()}
    texts = {r["doc_id"]: r["tl"] for r in docs.select("doc_id", F.octet_length("text").alias("tl")).collect()}
    for d, tl in texts.items():
        for f in range(0, 2 + d % 4, 2):
            got = rows[d * 100 + f]
            assert (got["width"], got["height"]) == (4 + d % 13, 4 + d % 7)
            assert got["mean_intensity"] == float(1 + (tl + f) % 127)
    assert len(rows) == sum(len(range(0, 2 + d % 4, 2)) for d in texts)


def test_extract_embedding_strided_fold_exact(spark):
    """The featurizer's spec: component i = L2-normalized sum of payload
    bytes at positions ≡ i (mod dim)."""
    import numpy as np

    from siddhi_io_cdc_spark.functions.multimodal import extract_embedding

    payload = bytes(range(1, 41))  # 40 bytes, dim 8 → 5 full rows
    df = spark.createDataFrame([(7, bytearray(payload))], "doc_id long, payload binary")
    got = extract_embedding(df, dim=8).first()
    v = np.frombuffer(payload, dtype=np.uint8).reshape(-1, 8).sum(axis=0).astype("float64")
    exp = [round(float(x), 6) for x in v / np.linalg.norm(v)]
    assert got["id"] == 7 and list(got["embedding"]) == exp


def test_image_dhash_hand_computed_and_quarantine(spark):
    """dHash against a hand-built 18x16 P5: bits are thumb[i,c+1] >
    thumb[i,c] with bit 63 as the sign bit; malformed payloads hash NULL
    (quarantined) unless strict."""
    import numpy as np
    import pytest

    from siddhi_io_cdc_spark.functions.multimodal import encode_ppm, image_dhash

    # block-constant 8x9 grid, expanded 2x2 -> exact area-mean recovery
    grid = (np.arange(72).reshape(8, 9) * 37 % 101).astype(np.uint8)
    img = np.kron(grid, np.ones((2, 2), dtype=np.uint8))
    acc = 0
    for i in range(8):
        for c in range(8):
            if grid[i, c + 1] > grid[i, c]:
                acc |= 1 << (i * 8 + c)
    want = acc - (1 << 64) if acc >= 1 << 63 else acc

    df = spark.createDataFrame(
        [(1, bytearray(encode_ppm(img))), (2, bytearray(b"nonsense"))],
        "doc_id long, payload binary",
    )
    got = {r["id"]: r["dhash"] for r in image_dhash(df).collect()}
    assert got == {1: want, 2: None}
    with pytest.raises(Exception, match="unsupported image payload"):
        image_dhash(df, strict=True).collect()


def test_image_near_dup_pairs_recall_and_plan(spark):
    """Pigeonhole blocking finds every pair within hamming <= 3 (verified
    against a local all-pairs reference) and the plan has exactly ONE
    Python node (the decode)."""
    import itertools

    import numpy as np

    from siddhi_io_cdc_spark.functions.multimodal import (
        encode_ppm,
        image_dhash,
        image_near_dup_pairs,
    )

    rng = np.random.RandomState(7)
    base = rng.randint(0, 200, size=(8, 9)).astype(np.uint8)
    rows = []
    for i in range(12):
        g = base.copy()
        if i % 3:  # small perturbations -> near dups of the base family
            g[i % 8, i % 9] = (int(g[i % 8, i % 9]) + 40) % 200
        if i >= 9:  # a distinct family
            g = (g + 97) % 200
        rows.append((i, bytearray(encode_ppm(np.kron(g, np.ones((2, 2), dtype=np.uint8))))))
    df = spark.createDataFrame(rows, "doc_id long, payload binary").repartition(4)

    hashes = {r["id"]: r["dhash"] for r in image_dhash(df).collect()}
    want = sorted(
        (a, b, bin(hashes[a] ^ hashes[b]).count("1"))
        for a, b in itertools.combinations(sorted(hashes), 2)
        if bin((hashes[a] ^ hashes[b]) & ((1 << 64) - 1)).count("1") <= 3
    )
    pairs = image_near_dup_pairs(df, max_hamming=3)
    got = sorted((r.id_a, r.id_b, r.hamming) for r in pairs.collect())
    assert got == [(a, b, h) for a, b, h in want]
    assert len(got) > 0

    # Python appears ONLY in the decode: the standalone dhash plan has
    # exactly one MapInPandas, and the pairs plan reuses the persisted
    # decode (InMemoryTableScan; the cached subtree prints per reference,
    # so count nodes there, not in the pairs plan) with JVM-side verify.
    hplan = image_dhash(df)._jdf.queryExecution().executedPlan().toString()
    assert hplan.count("MapInPandas") == 1
    plan = pairs._jdf.queryExecution().executedPlan().toString()
    assert "InMemoryTableScan" in plan
    assert "EvalPython" not in plan and "bit_count" in plan


def test_attach_gradient_ppm_payload_bytes_exact(spark):
    """The transform/sequence form of the gradient payload (an O(1)-size
    expression tree — the unrolled per-cell form cost ~2 s of Catalyst
    analysis per run) is BYTE-identical to a pure-Python restatement of
    the documented closed form, across the %7 / %11 perturbation branches
    and a group >= 113 profile (the second mixing term)."""
    from siddhi_io_cdc_spark.functions.multimodal import (
        attach_gradient_ppm_payload,
    )

    def ref_payload(doc_id: int, groups: int = 40) -> bytes:
        group = doc_id % groups

        def v(i: int, j: int) -> int:
            base = (
                group * 37
                + (group // 113) * (i * 17 + j * 5 + 3)
                + (i * 13 + j * 29)
            ) % 113
            shifts = 0
            if (i, j) == (3, 4) and doc_id % 7 == 0:
                shifts += 57
            if (i, j) in ((1, 2), (6, 5)) and doc_id % 11 == 0:
                shifts += 23
            return (base + shifts) % 113 + 1

        raster = "".join(
            chr(v(r // 2, j)) * 2 for r in range(16) for j in range(9)
        )
        return ("P5\n18 16\n255\n" + raster).encode("utf-8")

    # ids hitting: plain, %7-only, %11-only, both (77), and group >= 113
    ids = [1, 7, 11, 77, 38, 113 * 40 + 5]
    df = spark.createDataFrame([(i,) for i in ids], "doc_id long")
    got = {
        r["doc_id"]: bytes(r["payload"])
        for r in attach_gradient_ppm_payload(df).collect()
    }
    for i in ids:
        assert got[i] == ref_payload(i), f"payload mismatch for id {i}"

    # the caller-supplied group expression path (the contract fixture's
    # constant-group-size shape) stays exact too
    from pyspark.sql import functions as F

    got2 = {
        r["doc_id"]: bytes(r["payload"])
        for r in attach_gradient_ppm_payload(
            df, group=F.floor(F.col("doc_id") / 50)
        ).collect()
    }

    def ref2(doc_id: int) -> bytes:
        g = doc_id // 50

        def v(i, j):
            base = (
                g * 37 + (g // 113) * (i * 17 + j * 5 + 3) + (i * 13 + j * 29)
            ) % 113
            s = 0
            if (i, j) == (3, 4) and doc_id % 7 == 0:
                s += 57
            if (i, j) in ((1, 2), (6, 5)) and doc_id % 11 == 0:
                s += 23
            return (base + s) % 113 + 1

        raster = "".join(
            chr(v(r // 2, j)) * 2 for r in range(16) for j in range(9)
        )
        return ("P5\n18 16\n255\n" + raster).encode("utf-8")

    for i in ids:
        assert got2[i] == ref2(i), f"group-expr payload mismatch for id {i}"
