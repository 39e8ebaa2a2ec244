"""Multimodal column conventions + decode/feature plumbing.

Convention: a multimodal asset is an opaque ``binary`` payload column plus a
typed metadata struct (``mm_meta``) carrying modality/mime/dims. All Spark
plumbing — schema, partition-preserving ``mapInPandas``, Arrow batch shapes —
is real and tested. Image decoding is REAL for self-describing formats:
binary netpbm (P5 grayscale / P6 RGB) and uncompressed 8/24/32-bit BMP are
parsed in pure numpy (no media libraries needed); audio decoding is REAL for
PCM WAV (RIFF). Other codecs go through Pillow when importable, else a
clearly-marked deterministic fake keeps pipelines testable end-to-end; swap
in soundfile/librosa for compressed audio — the Spark-side contract does not
change. Malformed payloads null out by default (``strict=True`` restores
hard errors). Video is the fixed-size-frame convention: a clip payload is
concatenated netpbm frames (``attach_video_payload``), sampled and split
JVM-side (``sample_frames`` / ``split_video_frames``), each frame then
flowing through the ordinary image decoder.

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


def encode_ppm(arr) -> bytes:
    """Serialize a uint8 numpy array to binary netpbm: H×W → P5 (grayscale),
    H×W×3 → P6 (RGB). The inverse of :func:`_parse_netpbm`; used by tests and
    fixtures to produce real image payloads without any media library."""
    import numpy as np

    a = np.ascontiguousarray(arr, dtype=np.uint8)
    if a.ndim == 2:
        magic, (h, w) = b"P5", a.shape
    elif a.ndim == 3 and a.shape[2] == 3:
        magic, (h, w) = b"P6", a.shape[:2]
    else:
        raise ValueError(f"expected H×W or H×W×3 uint8 array, got shape {a.shape}")
    return magic + f"\n{w} {h}\n255\n".encode("ascii") + a.tobytes()


def _parse_netpbm(b: bytes):
    """Parse binary netpbm (P5 grayscale / P6 RGB) → (width, height, pixels)
    in pure numpy, or None if the payload is not netpbm. Handles ``#``
    comments and any header whitespace; only 1-byte samples (maxval ≤ 255)
    are supported — the common case and the only one our fixtures emit."""
    import numpy as np

    if len(b) < 2 or b[:2] not in (b"P5", b"P6"):
        return None
    channels = 1 if b[:2] == b"P5" else 3
    pos, tokens = 2, []
    while len(tokens) < 3 and pos < len(b):
        c = b[pos : pos + 1]
        if c.isspace():
            pos += 1
        elif c == b"#":
            while pos < len(b) and b[pos : pos + 1] != b"\n":
                pos += 1
        else:
            start = pos
            while pos < len(b) and not b[pos : pos + 1].isspace():
                pos += 1
            tokens.append(int(b[start:pos]))
    if len(tokens) < 3:
        raise ValueError("truncated netpbm header")
    pos += 1  # exactly one whitespace byte separates maxval from the raster
    w, h, maxval = tokens
    if maxval > 255:
        raise ValueError(f"netpbm maxval {maxval} > 255 (2-byte samples) unsupported")
    n = w * h * channels
    if len(b) - pos < n:
        raise ValueError(f"netpbm raster truncated: need {n} bytes, have {len(b) - pos}")
    return w, h, np.frombuffer(b, dtype=np.uint8, count=n, offset=pos)


def _parse_bmp(b: bytes):
    """Parse an uncompressed 8/24/32-bit BMP → (width, height, pixels) in
    pure numpy, or None if the payload is not BMP. 8-bpp payloads are read as
    grayscale palette indices; 32-bpp alpha bytes are dropped. Row order
    (bottom-up vs top-down) is irrelevant to dims/mean."""
    import struct

    import numpy as np

    if len(b) < 2 or b[:2] != b"BM":
        return None
    if len(b) < 34:
        raise ValueError("truncated BMP header")
    data_off = struct.unpack_from("<I", b, 10)[0]
    w, h = struct.unpack_from("<ii", b, 18)
    bpp = struct.unpack_from("<H", b, 28)[0]
    compression = struct.unpack_from("<I", b, 30)[0]
    if compression != 0 or bpp not in (8, 24, 32):
        raise ValueError(f"unsupported BMP: compression={compression}, bpp={bpp}")
    height = abs(h)
    bytes_per_px = bpp // 8
    row_data = w * bytes_per_px
    stride = (row_data + 3) & ~3  # rows pad to 4-byte boundaries
    rows = [
        np.frombuffer(b, np.uint8, count=row_data, offset=data_off + r * stride)
        for r in range(height)
    ]
    px = np.concatenate(rows) if rows else np.empty(0, np.uint8)
    if bpp == 32:
        px = px.reshape(-1, 4)[:, :3].ravel()  # BGRA → drop alpha
    return w, height, px


def decode_image_features(
    df: DataFrame, id_col: str = "doc_id", strict: bool = False
) -> DataFrame:
    """Decode image payloads → (id, width, height, mean_intensity).

    REAL decode for self-describing formats — binary netpbm (P5/P6) and
    uncompressed BMP — parsed in pure numpy; other codecs go through Pillow
    when importable. Unknown payloads fall back to a clearly-marked
    DETERMINISTIC FAKE (dims/intensity derived from the payload bytes) so
    hermetic pipelines still run end-to-end. ``mean_intensity`` averages all
    samples (channels weighted equally). The ``mapInPandas`` plumbing —
    Arrow batch in, Arrow batch out, partition-preserving — is the
    production shape.

    MALFORMED payloads (a recognized magic with a truncated/unsupported
    body — routine in crawled media) yield NULL features by default so one
    corrupt asset cannot fail a whole curation task; filter
    ``width IS NULL`` downstream to quarantine them. ``strict=True`` opts
    back into hard per-payload errors.
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

        def one(b: bytes):
            parsed = _parse_netpbm(b)
            if parsed is None:
                parsed = _parse_bmp(b)
            if parsed is not None:
                w, h, px = parsed
                return w, h, round(float(px.mean()) if px.size else 0.0, 6)
            if have_pil:  # pragma: no cover - Pillow not in this container
                import numpy as np

                img = Image.open(io.BytesIO(b))
                a = np.asarray(img.convert("L"), dtype=np.float64)
                return img.size[0], img.size[1], round(float(a.mean()), 6)
            # Deterministic fake: dims/intensity from the bytes themselves.
            w = 16 + (b[0] % 64) if b else 16
            h = 16 + (b[-1] % 64) if b else 16
            return w, h, round((sum(b) / len(b)) if b else 0.0, 6)

        for pdf in batches:
            ids, ws, hs, means = [], [], [], []
            for i, payload in zip(pdf["id"], pdf["payload"]):
                try:
                    w, h, mean = one(bytes(payload))
                except ValueError:
                    if strict:
                        raise
                    w = h = mean = None
                ids.append(i)
                ws.append(w)
                hs.append(h)
                means.append(mean)
            yield pd.DataFrame(
                {
                    "id": ids,
                    "width": pd.array(ws, dtype="Int32"),
                    "height": pd.array(hs, dtype="Int32"),
                    "mean_intensity": pd.array(means, dtype="Float64"),
                }
            )

    return src.mapInPandas(_decode, schema=IMAGE_FEATURES_SCHEMA)


def attach_ppm_payload(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Build REAL binary PGM (P5) payloads with pure JVM expressions.

    Dimensions derive from the id (``4 + id % 13`` × ``4 + id % 7``) and every
    pixel equals ``1 + octet_length(text) % 127`` — kept in the ASCII range so
    ``repeat(char(px)) → encode(UTF-8)`` is byte-exact. The payloads parse
    through the real :func:`_parse_netpbm` path, and every output feature has
    a closed-form ANSI-SQL restatement, which is what gives the contract's
    ``llm_multimodal_decode`` an exact value oracle instead of rows-only."""
    id_ = F.col(id_col)
    w = (F.lit(4) + id_ % 13).cast("int")
    h = (F.lit(4) + id_ % 7).cast("int")
    px = (F.lit(1) + F.octet_length(F.col(text_col)) % 127).cast("int")
    out = df.withColumn("__w", w).withColumn("__h", h).withColumn("__px", px)
    header = F.concat(
        F.lit("P5\n"),
        F.col("__w").cast("string"),
        F.lit(" "),
        F.col("__h").cast("string"),
        F.lit("\n255\n"),
    )
    raster = F.expr("repeat(char(__px), __w * __h)")
    return (
        out.withColumn("payload", F.encode(F.concat(header, raster), "UTF-8"))
        .withColumn(
            "mm_meta",
            F.struct(
                F.lit("image").alias("modality"),
                F.lit("image/x-portable-graymap").alias("mime"),
                F.col("__w").alias("width"),
                F.col("__h").alias("height"),
                F.lit(None).cast("int").alias("sample_rate"),
                F.lit(None).cast("int").alias("n_frames"),
            ),
        )
        .drop("__w", "__h", "__px")
    )


def sample_frames(df: DataFrame, every_n: int = 10, n_frames_col: str = "mm_meta") -> DataFrame:
    """Video frame sampling plan: emit one row per sampled frame index.

    Pure JVM (sequence + explode); the per-frame decode then runs through
    ``decode_image_features``. Rows without frame counts are dropped."""
    n = F.col(f"{n_frames_col}.n_frames")
    return (
        df.where(n.isNotNull() & (n > 0))
        .withColumn("frame_idx", F.explode(F.sequence(F.lit(0), n - 1, F.lit(every_n))))
    )


def attach_video_payload(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Build REAL multi-frame video payloads with pure JVM expressions: a
    clip is ``2 + id % 4`` concatenated binary P5 frames of ``4 + id % 13``
    × ``4 + id % 7`` pixels, frame ``f``'s constant pixel being
    ``1 + (octet_length(text) + f) % 127`` (ASCII range keeps the
    string→UTF-8 encode byte-exact, same trick as
    :func:`attach_ppm_payload`). Every sampled-frame feature therefore has
    a closed ANSI-SQL form — the contract's ``llm_video_frames`` runs as an
    exact value oracle. ``mm_meta`` carries the fixed frame dims and
    ``n_frames``."""
    id_ = F.col(id_col)
    w = (F.lit(4) + id_ % 13).cast("int")
    h = (F.lit(4) + id_ % 7).cast("int")
    n = (F.lit(2) + id_ % 4).cast("int")
    out = (
        df.withColumn("__w", w).withColumn("__h", h).withColumn("__n", n)
        .withColumn("__len", F.octet_length(F.col(text_col)))
    )
    header = F.concat(
        F.lit("P5\n"),
        F.col("__w").cast("string"),
        F.lit(" "),
        F.col("__h").cast("string"),
        F.lit("\n255\n"),
    )
    frames = F.transform(
        F.sequence(F.lit(0), F.col("__n") - 1),
        lambda f: F.concat(
            header,
            _repeat_char(F.lit(1) + F.pmod(F.col("__len") + f, F.lit(127)), F.col("__w") * F.col("__h")),
        ),
    )
    return (
        out.withColumn("payload", F.encode(F.array_join(frames, ""), "UTF-8"))
        .withColumn(
            "mm_meta",
            F.struct(
                F.lit("video").alias("modality"),
                F.lit("video/x-raw-netpbm").alias("mime"),
                F.col("__w").alias("width"),
                F.col("__h").alias("height"),
                F.lit(None).cast("int").alias("sample_rate"),
                F.col("__n").alias("n_frames"),
            ),
        )
        .drop("__w", "__h", "__n", "__len")
    )


def _repeat_char(code: "F.Column", times: "F.Column") -> "F.Column":
    """``repeat(char(code), times)`` as a column expression (both args are
    columns, which ``F.expr`` string templates can't bind)."""
    return F.repeat(F.char(code), times)


def split_video_frames(
    df: DataFrame, every_n: int = 1, id_col: str = "doc_id"
) -> DataFrame:
    """Split fixed-size-frame clip payloads into one row per sampled frame,
    each with its own single-image ``frame_payload``.

    Frame size is computed JVM-side from ``mm_meta`` (netpbm header length +
    ``width·height`` raster bytes), the slice is a ``substring`` on the
    binary column — no Python, no shuffle; the explode is a narrow
    generator. Each ``frame_payload`` then flows through the ordinary
    :func:`decode_image_features`. Requires constant frame dims per clip
    (the ``attach_video_payload`` convention; variable-size frames need a
    container format and a per-codec splitter in the decode seam)."""
    w = F.col("mm_meta.width")
    h = F.col("mm_meta.height")
    header_len = (
        F.lit(3) + F.length(w.cast("string")) + F.lit(1)
        + F.length(h.cast("string")) + F.lit(5)
    )
    out = sample_frames(df, every_n=every_n).withColumn(
        "__fsize", header_len + w * h
    )
    return out.withColumn(
        "frame_payload",
        F.expr("substring(payload, frame_idx * __fsize + 1, __fsize)"),
    ).drop("__fsize")


def extract_embedding(df: DataFrame, id_col: str = "doc_id", dim: int = 16) -> DataFrame:
    """Strided-fold byte featurizer: payload → L2-normalized ``dim``-vector.

    The operator IS a (degenerate, sparse) random projection: component
    ``i`` sums the payload bytes at positions ``p ≡ i (mod dim)`` — i.e. a
    fixed 0/1 projection matrix over the byte stream — then L2-normalizes.
    Fully deterministic and closed-form (exact SQL oracle:
    ``llm_payload_embedding``), cheap (one pass over the bytes, vectorized
    numpy per Arrow batch), and useful as a content fingerprint for
    near-dup blocking of binary assets.

    MODEL-SWAP SEAM: a production encoder (CLIP, wav2vec, …) replaces ONLY
    the inner per-batch function — same ``mapInPandas`` signature, same
    ``(id, embedding array<double>)`` contract, same partition-preserving /
    no-shuffle plan; everything downstream (ANN, embedding near-dup,
    centroids) is agnostic to which encoder produced the vectors."""

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


def encode_wav(samples, sample_rate: int = 16000) -> bytes:
    """Serialize int16 numpy samples to a canonical mono PCM WAV (RIFF)
    file. The inverse of :func:`_parse_wav`; used by tests and fixtures to
    produce real audio payloads without any media library."""
    import struct

    import numpy as np

    data = np.ascontiguousarray(samples, dtype="<i2").tobytes()
    hdr = struct.pack(
        "<4sI4s4sIHHIIHH4sI",
        b"RIFF", 36 + len(data), b"WAVE",
        b"fmt ", 16, 1, 1, sample_rate, sample_rate * 2, 2, 16,
        b"data", len(data),
    )
    return hdr + data


def _parse_wav(b: bytes):
    """Parse a PCM WAV (RIFF) payload → (sample_rate, samples in [-1, 1)) in
    pure numpy, or None if the payload is not RIFF/WAVE. Walks the chunk
    list (chunks pad to even offsets), supports uncompressed 8/16-bit,
    downmixes multi-channel by averaging."""
    import struct

    import numpy as np

    if len(b) < 12 or b[:4] != b"RIFF" or b[8:12] != b"WAVE":
        return None
    pos, fmt, data = 12, None, None
    while pos + 8 <= len(b):
        cid = b[pos : pos + 4]
        size = struct.unpack_from("<I", b, pos + 4)[0]
        body = b[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            audio_fmt, channels, sr, _, _, bits = struct.unpack_from("<HHIIHH", body, 0)
            fmt = (audio_fmt, channels, sr, bits)
        elif cid == b"data":
            data = body
        pos += 8 + size + (size & 1)
    if fmt is None or data is None:
        raise ValueError("WAV missing fmt/data chunk")
    audio_fmt, channels, sr, bits = fmt
    if audio_fmt != 1 or bits not in (8, 16):
        raise ValueError(f"unsupported WAV: format={audio_fmt}, bits={bits}")
    if bits == 16:
        x = np.frombuffer(data, "<i2").astype(np.float64) / 32768.0
    else:
        x = (np.frombuffer(data, np.uint8).astype(np.float64) - 128.0) / 128.0
    if channels > 1:
        x = x[: (x.size // channels) * channels].reshape(-1, channels).mean(axis=1)
    return sr, x


def decode_audio_features(
    df: DataFrame, id_col: str = "doc_id", sample_rate: int = 16000,
    strict: bool = False,
) -> DataFrame:
    """Decode audio payloads → (id, n_samples, duration_s, rms).

    REAL decode for PCM WAV (RIFF) payloads — parsed in pure numpy via
    :func:`_parse_wav` (8/16-bit, multi-channel downmix), with sample rate
    and counts taken from the file itself. Non-RIFF payloads fall back to
    the clearly-marked DETERMINISTIC FAKE (bytes as 8-bit PCM at
    ``mm_meta.sample_rate`` / the given default) so hermetic pipelines still
    run; swap in soundfile/librosa for compressed codecs. Spark plumbing
    (Arrow-batched ``mapInPandas``, vectorized numpy inside the batch) is
    the production shape either way.

    MALFORMED payloads (RIFF magic, bad body: missing fmt/data chunk,
    unsupported codec) yield NULL features by default — one corrupt crawled
    asset must not fail the task; ``strict=True`` restores hard errors.
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
                b = bytes(payload)
                try:
                    parsed = _parse_wav(b)
                except ValueError:
                    if strict:
                        raise
                    ns.append(None)
                    dur.append(None)
                    rms.append(None)
                    continue
                if parsed is not None:
                    wav_sr, x = parsed
                    n = int(x.size)
                    ns.append(n)
                    dur.append(round(n / float(wav_sr), 6))
                    rms.append(
                        round(float(np.sqrt(np.mean(x * x))), 6) if n else 0.0
                    )
                    continue
                raw = np.frombuffer(b, dtype=np.uint8)
                n = int(raw.size)
                ns.append(n)
                dur.append(round(n / float(sr), 6))
                if n:
                    x = (raw.astype("float64") - 128.0) / 128.0  # fake 8-bit PCM
                    rms.append(round(float(np.sqrt(np.mean(x * x))), 6))
                else:
                    rms.append(0.0)
            yield pd.DataFrame(
                {
                    "id": pdf["id"],
                    "n_samples": pd.array(ns, dtype="Int32"),
                    "duration_s": pd.array(dur, dtype="Float64"),
                    "rms": pd.array(rms, dtype="Float64"),
                }
            )

    return src.mapInPandas(_decode, schema=AUDIO_FEATURES_SCHEMA)


def attach_wav_payload(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text",
    sample_rate: int = 8000,
) -> DataFrame:
    """Build REAL mono 16-bit PCM WAV payloads whose features have closed
    ANSI-SQL forms: ``1 + octet_length(text) % 400`` constant samples of
    amplitude ``2048·((id % 16) − 8)`` (so rms = |id%16 − 8| / 16 exactly —
    a power-of-two denominator keeps every engine's arithmetic bit-equal).
    Payload bytes are produced by :func:`encode_wav` in an Arrow-batched
    ``mapInPandas`` (fixture-side Python; the decode path under test stays
    the real parser)."""
    src = df.select(
        F.col(id_col).alias("__id"),
        (F.lit(1) + F.octet_length(F.col(text_col)) % 400).alias("__n"),
        (F.lit(2048) * ((F.col(id_col) % 16) - 8)).cast("int").alias("__amp"),
    )
    out_schema = T.StructType(
        [
            T.StructField(id_col, T.LongType(), False),
            T.StructField("payload", T.BinaryType(), True),
            T.StructField("mm_meta", MM_META_SCHEMA, True),
        ]
    )

    def _build(batches: Iterator) -> Iterator:
        import numpy as np
        import pandas as pd

        for pdf in batches:
            payloads = [
                encode_wav(np.full(int(n), int(a), dtype=np.int16), sample_rate)
                for n, a in zip(pdf["__n"], pdf["__amp"])
            ]
            metas = [
                {
                    "modality": "audio", "mime": "audio/wav",
                    "width": None, "height": None,
                    "sample_rate": sample_rate, "n_frames": None,
                }
                for _ in payloads
            ]
            yield pd.DataFrame(
                {id_col: pdf["__id"], "payload": payloads, "mm_meta": metas}
            )

    return src.mapInPandas(_build, schema=out_schema)


def resize_images(
    df: DataFrame, width: int, height: int, id_col: str = "doc_id",
    strict: bool = False,
) -> DataFrame:
    """Resize image payloads to ``width``×``height`` → same (payload,
    mm_meta) convention with updated dims.

    Spark contract identical to the other decoders: partition-preserving
    Arrow-batched ``mapInPandas``, binary in/binary out. netpbm payloads
    (P5/P6) resample for REAL — nearest-neighbor in pure numpy, re-encoded
    through :func:`encode_ppm`; other codecs go through Pillow when
    importable; unknown payloads keep the clearly-fake byte-striding so
    downstream batch shapes and sizes stay production-true.
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

            def fallback(b: bytes) -> bytes:
                img = Image.open(_io.BytesIO(b)).resize((width, height))
                buf = _io.BytesIO()
                img.save(buf, format="PNG")
                return buf.getvalue()

        except ImportError:

            def fallback(b: bytes) -> bytes:
                arr = np.frombuffer(b, dtype=np.uint8)
                n = width * height
                if arr.size == 0:
                    return bytes(n)
                idx = (np.arange(n) * max(arr.size // n, 1)) % arr.size
                return arr[idx].tobytes()

        def one(b: bytes) -> bytes:
            parsed = _parse_netpbm(b)
            if parsed is None:
                return fallback(b)
            # Real nearest-neighbor resample, re-encoded as netpbm.
            src_w, src_h, px = parsed
            channels = px.size // (src_w * src_h) if src_w * src_h else 1
            shape = (src_h, src_w) if channels == 1 else (src_h, src_w, channels)
            img = px.reshape(shape)
            rows = (np.arange(height) * src_h // height).clip(0, src_h - 1)
            cols = (np.arange(width) * src_w // width).clip(0, src_w - 1)
            return encode_ppm(img[rows][:, cols])

        base_meta = {
            "modality": "image", "mime": None,
            "width": None, "height": None, "sample_rate": None, "n_frames": None,
        }
        def safe_one(b: bytes):
            # Malformed payload (good magic, bad body): null out rather than
            # failing the task; strict=True restores hard errors.
            try:
                return one(b)
            except ValueError:
                if strict:
                    raise
                return None

        for pdf in batches:
            payloads = [safe_one(bytes(p)) if p is not None else None for p in pdf["payload"]]
            metas = [
                {**(base_meta if m is None else dict(m)), "width": width, "height": height}
                for m in pdf["mm_meta"]
            ]
            yield pd.DataFrame({"id": pdf["id"], "payload": payloads, "mm_meta": metas})

    return src.mapInPandas(_resize, schema=out_schema)


def image_dhash(
    df: DataFrame, id_col: str = "doc_id", strict: bool = False
) -> DataFrame:
    """Perceptual difference-hash (dHash) of image payloads → 64-bit long.

    Decode (the ONLY Python node: same pure-numpy netpbm/BMP parsers as
    :func:`decode_image_features`, Arrow-batched, partition-preserving) →
    area-mean downsample to an 8-row × 9-column grayscale thumbnail (block
    boundaries at ``floor(i·H/8)`` / ``floor(j·W/9)``, so dims divisible by
    8/9 downsample EXACTLY — the property the closed-form oracle fixtures
    use) → bit ``k = i·8 + c`` set iff ``thumb[i, c+1] > thumb[i, c]``.
    dHash is the standard perceptual fingerprint for crawl-scale image
    dedup: near-identical images (recompression, slight crops, brightness
    shifts) land within a few bits, unrelated images ~32 bits apart.
    Malformed payloads yield NULL unless ``strict``.
    """
    src = df.select(F.col(id_col).alias("id"), "payload")

    def _hash(batches: Iterator) -> Iterator:
        import numpy as np
        import pandas as pd

        def one(b: bytes):
            parsed = _parse_netpbm(b)
            if parsed is None:
                parsed = _parse_bmp(b)
            if parsed is None:
                raise ValueError("unsupported image payload")
            w, h, px = parsed
            px = np.asarray(px, dtype=np.float64)
            if px.size == w * h * 3:  # RGB flat -> equal-weight gray
                px = px.reshape(h, w, 3).mean(axis=2)
            elif px.size == w * h:
                px = px.reshape(h, w)
            else:
                raise ValueError(f"pixel count {px.size} != {w}x{h}[x3]")
            rb = [(i * h) // 8 for i in range(9)]
            cb = [(j * w) // 9 for j in range(10)]
            if rb[1] == 0 or cb[1] == 0:
                raise ValueError(f"image {w}x{h} too small for 9x8 dHash grid")
            thumb = np.empty((8, 9))
            for i in range(8):
                for j in range(9):
                    thumb[i, j] = px[rb[i]:rb[i + 1], cb[j]:cb[j + 1]].mean()
            acc = np.uint64(0)
            for i in range(8):
                for c in range(8):
                    if thumb[i, c + 1] > thumb[i, c]:
                        acc |= np.uint64(1) << np.uint64(i * 8 + c)
            return int(acc.astype(np.int64))  # bit 63 -> sign bit, like simhash64

        for pdf in batches:
            ids, hashes = [], []
            for i, payload in zip(pdf["id"], pdf["payload"]):
                try:
                    v = one(bytes(payload))
                except ValueError:
                    if strict:
                        raise
                    v = None
                ids.append(i)
                hashes.append(v)
            yield pd.DataFrame(
                {"id": ids, "dhash": pd.array(hashes, dtype="Int64")}
            )

    return src.mapInPandas(_hash, schema="id long, dhash long")


def image_near_dup_pairs(
    df: DataFrame, id_col: str = "doc_id", max_hamming: int = 3
) -> DataFrame:
    """Near-duplicate image pairs: :func:`image_dhash` (one Python decode
    node) then the pigeonhole 16-bit-chunk blocking shared with
    ``dedup.simhash_pairs`` — GUARANTEED 100 % recall for
    ``max_hamming < 4``, never all-pairs, everything after the decode pure
    JVM. Undecodable payloads (NULL hash) are quarantined, not paired.
    Returns ``(id_a, id_b, hamming)``."""
    from siddhi_io_cdc_spark.functions.dedup import hash64_pairs
    from siddhi_io_cdc_spark.util import scoped_persist, tag_caches

    # Persist: the decode is the expensive part and feeds both sides of the
    # chunk self-join.
    h = scoped_persist(image_dhash(df, id_col=id_col).where(F.col("dhash").isNotNull()))
    pairs = hash64_pairs(h, id_col="id", hash_col="dhash", max_hamming=max_hamming)
    return tag_caches(pairs, [h])


def attach_gradient_ppm_payload(
    df: DataFrame, id_col: str = "doc_id", groups: int = 40, group=None
) -> DataFrame:
    """Build 18×16 P5 payloads whose dHash has a CLOSED-FORM SQL
    restatement, for exact near-dup oracles (the constant-pixel
    :func:`attach_ppm_payload` fixtures all hash to 0 — degenerate).

    Pixel (r, c) = ``v(r//2, c//2)`` over an 8×9 block grid with
    ``v(i,j) = (group·37 + i·13 + j·29) % 113 + 1`` and
    ``group = id % groups`` (or a caller-supplied ``group`` Column — pass a
    CONSTANT-group-SIZE expression like ``id // 50`` so the planted pair
    count scales LINEARLY with the corpus instead of quadratically, which
    is what the contract fixture does) — block-constant, so the 8×9 area-mean
    thumbnail recovers ``v`` EXACTLY (18 = 9·2, 16 = 8·2) and every dHash
    bit is an integer comparison restatable in ANSI SQL. Values stay in
    1..113 so ``char() → encode(UTF-8)`` is byte-exact (>127 would emit
    two bytes).

    Two perturbations make the hamming verify discriminating: docs with
    ``id % 7 == 0`` shift cell (3,4) by +57 (flips ≤ 2 bits → still a
    near-dup of their group) and docs with ``id % 11 == 0`` shift cells
    (1,2) and (6,5) by +23 (≤ 4 more bits → pairs against differently
    perturbed group-mates can exceed ``max_hamming`` and must be
    excluded)."""
    id_ = F.col(id_col)
    if group is None:
        group = id_ % groups

    def v(i: F.Column, j: F.Column) -> F.Column:
        # Two group-mixing terms: group*37 alone cycles every 113 groups
        # (113 distinct profiles total -> pair growth goes quadratic past
        # ~113 groups); the (group // 113)-weighted cell term pushes the
        # profile-collision period to 113^2 = 12769 groups, keeping planted
        # pair counts linear to ~638k fixture docs. Zero for groups < 113,
        # so small fixtures and their oracles are unaffected.
        #
        # (i, j) arrive as runtime INT columns from the sequence lambdas
        # below — the arithmetic is the same exact integer math as the old
        # per-cell unrolled literals (pinned by the byte-identity test),
        # but the expression tree is O(1) in the grid size instead of one
        # subtree per cell: the unrolled form cost ~2 s of Catalyst
        # analysis PER RUN at 8×9×2 cells (profiled: 2.25 s driver gap
        # against 0.75 s of execution).
        base = (
            group * 37
            + F.floor(group / 113) * (i * 17 + j * 5 + 3)
            + (i * 13 + j * 29)
        ) % 113
        shifts = F.when(
            ((id_ % 7) == 0) & (i == 3) & (j == 4), 57
        ).otherwise(0) + F.when(
            ((id_ % 11) == 0) & (((i == 1) & (j == 2)) | ((i == 6) & (j == 5))),
            23,
        ).otherwise(0)
        return ((base + shifts) % 113 + 1).cast("int")

    header = F.lit("P5\n18 16\n255\n")
    # each 8×9 block row spans 2 raster rows: raster row r uses block row
    # r // 2, and every cell value repeats for 2 raster columns
    raster = F.concat_ws(
        "",
        F.transform(
            F.sequence(F.lit(0), F.lit(15)),
            lambda r: F.concat_ws(
                "",
                F.transform(
                    F.sequence(F.lit(0), F.lit(8)),
                    lambda j: F.repeat(
                        F.char(v(F.floor(r / 2).cast("int"), j)), 2
                    ),
                ),
            ),
        ),
    )
    payload = F.encode(F.concat(header, raster), "UTF-8")
    return df.withColumn("payload", payload).withColumn(
        "mm_meta",
        F.struct(
            F.lit("image").alias("modality"),
            F.lit("image/x-portable-graymap").alias("mime"),
            F.lit(18).alias("width"),
            F.lit(16).alias("height"),
            F.lit(None).cast("int").alias("sample_rate"),
            F.lit(None).cast("int").alias("n_frames"),
        ),
    )
