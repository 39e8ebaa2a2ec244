"""Multimodal column conventions + decode/feature plumbing.

Convention: a multimodal asset is an opaque ``binary`` payload column plus a
typed metadata struct (``mm_meta``) carrying modality/mime/dims. All Spark
plumbing — schema, partition-preserving ``mapInPandas``, Arrow batch shapes —
is real and tested; the actual media decoding is STUBBED (this container has
no image/audio libraries): ``decode_image`` tries Pillow and otherwise
produces a clearly-marked deterministic fake so pipelines are testable
end-to-end. Swap the inner function for a real decoder in production; the
Spark-side contract does not change.

Scale notes: payloads stay in Arrow buffers end-to-end (binary columns are
zero-copy through ``mapInPandas``); feature extraction batches by
``spark.sql.execution.arrow.maxRecordsPerBatch``; nothing here shuffles.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MM_META_SCHEMA = T.StructType(
    [
        T.StructField("modality", T.StringType(), False),  # image|audio|video|text
        T.StructField("mime", T.StringType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("sample_rate", T.IntegerType(), True),
        T.StructField("n_frames", T.IntegerType(), True),
    ]
)


def attach_payload(
    df: DataFrame, src_col: str, modality: str = "image", mime: str | None = None
) -> DataFrame:
    """Wrap a column into the (payload binary, mm_meta struct) convention.

    For tests the payload derives deterministically from ``src_col`` text."""
    return df.withColumn("payload", F.encode(F.col(src_col).cast("string"), "UTF-8")).withColumn(
        "mm_meta",
        F.struct(
            F.lit(modality).alias("modality"),
            F.lit(mime).cast("string").alias("mime"),
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            F.lit(None).cast("int").alias("sample_rate"),
            F.lit(None).cast("int").alias("n_frames"),
        ),
    )


IMAGE_FEATURES_SCHEMA = "id long, width int, height int, mean_intensity double"


def decode_image_features(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Decode image payloads → (id, width, height, mean_intensity).

    Real decode requires Pillow; absent that, a DETERMINISTIC FAKE decoder
    derives pseudo-dimensions and intensity from the payload bytes (marked by
    width/height being byte-derived). The ``mapInPandas`` plumbing — Arrow
    batch in, Arrow batch out, partition-preserving — is the production shape.
    """
    try:
        from PIL import Image  # noqa: F401

        have_pil = True
    except ImportError:
        have_pil = False

    src = df.select(F.col(id_col).alias("id"), "payload")

    def _decode(batches: Iterator) -> Iterator:
        import io

        import pandas as pd

        for pdf in batches:
            ids, ws, hs, means = [], [], [], []
            for i, payload in zip(pdf["id"], pdf["payload"]):
                b = bytes(payload)
                if have_pil:
                    img = Image.open(io.BytesIO(b))  # pragma: no cover (no PIL here)
                    w, h = img.size
                    mean = 0.0
                    raise NotImplementedError(
                        "real decode path requires pixel access; wire your decoder here"
                    )
                # Deterministic fake: dims/intensity from the bytes themselves.
                w = 16 + (b[0] % 64) if b else 16
                h = 16 + (b[-1] % 64) if b else 16
                mean = (sum(b) / len(b)) if b else 0.0
                ids.append(i)
                ws.append(w)
                hs.append(h)
                means.append(round(mean, 6))
            yield pd.DataFrame({"id": ids, "width": ws, "height": hs, "mean_intensity": means})

    return src.mapInPandas(_decode, schema=IMAGE_FEATURES_SCHEMA)


def sample_frames(df: DataFrame, every_n: int = 10, n_frames_col: str = "mm_meta") -> DataFrame:
    """Video frame sampling plan: emit one row per sampled frame index.

    Pure JVM (sequence + explode); the per-frame decode then runs through
    ``decode_image_features``. Rows without frame counts are dropped."""
    n = F.col(f"{n_frames_col}.n_frames")
    return (
        df.where(n.isNotNull() & (n > 0))
        .withColumn("frame_idx", F.explode(F.sequence(F.lit(0), n - 1, F.lit(every_n))))
    )


def extract_embedding(df: DataFrame, id_col: str = "doc_id", dim: int = 16) -> DataFrame:
    """STUB feature extractor: deterministic pseudo-embedding from payload
    bytes (stands in for a model forward pass; Arrow-batched, vectorized
    numpy — the exact batch shape a real encoder UDF uses)."""

    src = df.select(F.col(id_col).alias("id"), "payload")

    def _embed(batches: Iterator) -> Iterator:
        import numpy as np
        import pandas as pd

        for pdf in batches:
            out = []
            for payload in pdf["payload"]:
                b = np.frombuffer(bytes(payload), dtype=np.uint8)
                if b.size == 0:
                    out.append([0.0] * dim)
                    continue
                # Fold bytes into `dim` buckets deterministically.
                pad = (-b.size) % dim
                v = np.pad(b, (0, pad)).reshape(-1, dim).sum(axis=0).astype("float64")
                nrm = float(np.linalg.norm(v)) or 1.0
                out.append([round(float(x), 6) for x in (v / nrm)])
            yield pd.DataFrame({"id": pdf["id"], "embedding": out})

    return src.mapInPandas(_embed, schema="id long, embedding array<double>")


AUDIO_FEATURES_SCHEMA = "id long, n_samples int, duration_s double, rms double"


def decode_audio_features(
    df: DataFrame, id_col: str = "doc_id", sample_rate: int = 16000
) -> DataFrame:
    """Decode audio payloads → (id, n_samples, duration_s, rms).

    Same contract as :func:`decode_image_features`: the Spark plumbing
    (Arrow-batched ``mapInPandas``, partition-preserving, vectorized numpy
    inside the batch) is the production shape; the codec itself is a
    DETERMINISTIC FAKE that treats the payload bytes as 8-bit PCM — swap the
    inner function for soundfile/librosa in production. ``sample_rate``
    falls back to the given default when ``mm_meta.sample_rate`` is NULL.
    """
    src = df.select(
        F.col(id_col).alias("id"),
        "payload",
        F.coalesce(F.col("mm_meta.sample_rate"), F.lit(sample_rate)).alias("__sr"),
    )

    def _decode(batches: Iterator) -> Iterator:
        import numpy as np
        import pandas as pd

        for pdf in batches:
            ns, dur, rms = [], [], []
            for payload, sr in zip(pdf["payload"], pdf["__sr"]):
                b = np.frombuffer(bytes(payload), dtype=np.uint8)
                n = int(b.size)
                ns.append(n)
                dur.append(round(n / float(sr), 6))
                if n:
                    x = (b.astype("float64") - 128.0) / 128.0  # fake 8-bit PCM
                    rms.append(round(float(np.sqrt(np.mean(x * x))), 6))
                else:
                    rms.append(0.0)
            yield pd.DataFrame(
                {"id": pdf["id"], "n_samples": ns, "duration_s": dur, "rms": rms}
            )

    return src.mapInPandas(_decode, schema=AUDIO_FEATURES_SCHEMA)


def resize_images(
    df: DataFrame, width: int, height: int, id_col: str = "doc_id"
) -> DataFrame:
    """Resize image payloads to ``width``×``height`` → same (payload,
    mm_meta) convention with updated dims.

    Spark contract identical to the other decoders: partition-preserving
    Arrow-batched ``mapInPandas``, binary in/binary out. The resampler
    tries Pillow; without it (this container) it produces a clearly-fake
    deterministic payload of exactly ``width*height`` bytes (byte-striding
    the source), so downstream batch shapes and sizes are production-true.
    """
    if width < 1 or height < 1:
        raise ValueError(f"target dims must be positive, got {width}x{height}")
    src = df.select(F.col(id_col).alias("id"), "payload", "mm_meta")
    out_schema = T.StructType(
        [
            T.StructField("id", T.LongType(), False),
            T.StructField("payload", T.BinaryType(), True),
            T.StructField("mm_meta", MM_META_SCHEMA, True),
        ]
    )

    def _resize(batches: Iterator) -> Iterator:
        import numpy as np
        import pandas as pd

        try:  # pragma: no cover - Pillow not in this container
            import io as _io

            from PIL import Image

            def one(b: bytes) -> bytes:
                img = Image.open(_io.BytesIO(b)).resize((width, height))
                buf = _io.BytesIO()
                img.save(buf, format="PNG")
                return buf.getvalue()

        except ImportError:

            def one(b: bytes) -> bytes:
                arr = np.frombuffer(b, dtype=np.uint8)
                n = width * height
                if arr.size == 0:
                    return bytes(n)
                idx = (np.arange(n) * max(arr.size // n, 1)) % arr.size
                return arr[idx].tobytes()

        for pdf in batches:
            payloads = [one(bytes(p)) if p is not None else None for p in pdf["payload"]]
            metas = [
                {**(m if isinstance(m, dict) else m), "width": width, "height": height}
                for m in pdf["mm_meta"]
            ]
            yield pd.DataFrame({"id": pdf["id"], "payload": payloads, "mm_meta": metas})

    return src.mapInPandas(_resize, schema=out_schema)
