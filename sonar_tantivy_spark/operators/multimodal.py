"""Multimodal column plumbing — image/audio/video as opaque binary.

The reference has no multimodal surface; this module adds the plumbing a
large-scale training-data pipeline needs on top of the same tables:
typed metadata around ``binary`` payload columns, Arrow-batched decode /
feature-extract / frame-sample operators via ``mapInPandas``.

The heavyweight codecs (ffmpeg/librosa) are NOT available in this
container, so the default decode step is STUBBED: ``decode_stub=True``
derives deterministic fake features from the payload bytes so the
Spark-side plumbing — schema, partitioning, UDF signature, batch shape
— is real and tested.  ``decode_stub=False`` routes IMAGE payloads
through a REAL decoder: PIL when installed (pixel-exact, tested behind
a skipif), else the pure-Python PNG fallback in functions/pngcodec.py
(stdlib zlib+struct; 8-bit gray/RGB/RGBA/palette subset — executable
and pixel-exact-tested in THIS sandbox).  Non-PNG payloads without
PIL, and audio/video, raise NotImplementedError at the point the
decoder would plug in.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from sonar_tantivy_spark.functions import pngcodec as _png

try:  # optional decoder probe (VERDICT r3 #5) — never required
    from PIL import Image as _PILImage  # type: ignore
except ImportError:  # pragma: no cover - exercised when PIL is absent
    _PILImage = None


def _pil_nearest():
    # Pillow ≥9.1 moved resampling constants under Image.Resampling
    r = getattr(_PILImage, "Resampling", _PILImage)
    return r.NEAREST

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image|audio|video
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("mime", T.StringType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("duration_ms", T.IntegerType(), True),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),
        T.StructField("n_bytes", T.LongType(), False),
        T.StructField("sha1", T.StringType(), False),
        T.StructField("n_frames", T.IntegerType(), False),
        # nullable: a null payload yields a null feature on the real-
        # decoder path (the stub path still always emits a vector)
        T.StructField("feature", T.ArrayType(T.FloatType()), True),
    ]
)


def media_from_docs(docs: DataFrame, text_col: str = "text",
                    id_col: str = "doc_id") -> DataFrame:
    """Synthesize a media table from a text corpus (payload = utf-8 bytes)
    — a deterministic stand-in for real blob columns in tests/benches."""
    kind = F.element_at(
        F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
        (F.col(id_col) % 3 + 1).cast("int"),
    )
    return docs.select(
        F.col(id_col).alias("media_id"),
        kind.alias("kind"),
        F.encode(F.col(text_col), "utf-8").alias("payload"),
        F.lit("application/octet-stream").alias("mime"),
        F.lit(None).cast("int").alias("width"),
        F.lit(None).cast("int").alias("height"),
        F.lit(None).cast("int").alias("duration_ms"),
    )


def _stub_feature(payload: bytes, dim: int) -> np.ndarray:
    """Deterministic fake embedding: sha1-seeded uniform vector."""
    seed = int.from_bytes(hashlib.sha1(payload).digest()[:8], "big") % (2**32)
    rng = np.random.default_rng(seed)
    return rng.random(dim, dtype=np.float32)


def extract_features(
    media: DataFrame,
    *,
    dim: int = 16,
    frame_stride: int = 1024,
    decode_stub: bool = True,
) -> DataFrame:
    """Decode + featurize binary payloads, Arrow-batched via mapInPandas.

    Real pipeline shape: batches arrive as Arrow buffers (zero-copy for
    binary), per-batch decode, fixed-dim float feature out.  ``n_frames``
    models frame sampling (1 frame per ``frame_stride`` payload bytes).

    ``decode_stub=False``: image payloads decode through PIL when it is
    installed, else through the pure-Python PNG fallback
    (functions/pngcodec.py) for PNG payloads (feature = the resized k×k
    grayscale pixel grid scaled to [0, 1], k² ≥ dim, truncated to
    ``dim`` — deterministic and pixel-exact on both routes); audio/video
    rows, or a non-PNG payload without PIL, raise NotImplementedError
    where the decoder plugs in.
    """

    def real_feature(p: bytes) -> list:
        import io
        import math
        k = max(1, math.ceil(math.sqrt(dim)))
        if _PILImage is not None:
            im = _PILImage.open(io.BytesIO(bytes(p))).convert("L")
            px = np.asarray(im.resize((k, k), _pil_nearest()),
                            dtype=np.float32).ravel() / 255.0
        else:
            g = _png.to_gray(_png.decode_png(bytes(p)))  # raises for non-PNG
            px = _png.resize_nearest(g, k, k).astype(
                np.float32).ravel() / 255.0
        return px[:dim].tolist()

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not decode_stub and (pdf["kind"] != "image").any():
                raise NotImplementedError(
                    "real decoders exist only for images (PIL); "
                    "audio/video decode plugs in here")
            # null payloads: the stub path guards with (b or b"") and
            # resize_images masks notna(); the real path must too —
            # PIL.open(bytes(None)) would TypeError and kill the task.
            # A null image has no pixels: feature is None, not zeros.
            feat = (pdf["payload"].map(
                        lambda b: _stub_feature(b or b"", dim).tolist())
                    if decode_stub else
                    pdf["payload"].map(
                        lambda b: None if b is None else real_feature(b)))
            out = {
                "media_id": pdf["media_id"],
                "kind": pdf["kind"],
                "n_bytes": pdf["payload"].map(lambda b: len(b) if b is not None else 0),
                "sha1": pdf["payload"].map(
                    lambda b: hashlib.sha1(b or b"").hexdigest()),
                "n_frames": pdf["payload"].map(
                    lambda b: max(1, (len(b) if b is not None else 0) // frame_stride)),
                "feature": feat,
            }
            yield pd.DataFrame(out)

    return media.mapInPandas(run, schema=FEATURE_SCHEMA)


def near_dup_by_feature(features: DataFrame, threshold: float = 0.99) -> DataFrame:
    """Embedding-cosine near-dup over extracted features: exact pairwise
    within sha1-prefix buckets (LSH-style blocking keeps it scale-sane)."""
    f = features.withColumn("bucket", F.substring("sha1", 1, 2))
    a, b = f.alias("a"), f.alias("b")
    dot = F.aggregate(
        F.zip_with(F.col("a.feature"), F.col("b.feature"), lambda x, y: x * y),
        F.lit(0.0), lambda acc, x: acc + x,
    )
    na = F.sqrt(F.aggregate(F.transform(F.col("a.feature"), lambda x: x * x),
                            F.lit(0.0), lambda acc, x: acc + x))
    nb = F.sqrt(F.aggregate(F.transform(F.col("b.feature"), lambda x: x * x),
                            F.lit(0.0), lambda acc, x: acc + x))
    return (
        a.join(b, on=[F.col("a.bucket") == F.col("b.bucket"),
                      F.col("a.media_id") < F.col("b.media_id")])
        .select(F.col("a.media_id").alias("m1"), F.col("b.media_id").alias("m2"),
                (dot / (na * nb)).alias("cos"))
        .filter(F.col("cos") >= threshold)
    )


RESIZED_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("mime", T.StringType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("duration_ms", T.IntegerType(), True),
    ]
)


def resize_images(
    media: DataFrame,
    *,
    width: int = 224,
    height: int = 224,
    decode_stub: bool = True,
) -> DataFrame:
    """Resize image payloads to (width, height), Arrow-batched via
    mapInPandas; non-image rows pass through untouched.

    Plumbing is real (schema, batch shape, pass-through routing); the
    default pixel work is STUBBED like extract_features: the fake
    'resized' payload is a deterministic function of (sha1(payload),
    width, height) sized ~width*height/64 bytes, so size-dependent
    downstream logic is testable.  ``decode_stub=False`` routes through
    PIL.Image.open(...).resize((width, height), NEAREST).tobytes() when
    PIL is installed (pixel-exact, tested behind a skipif), else through
    the pure-Python PNG fallback (functions/pngcodec.py — pixel-exact
    raw bytes for the 8-bit PNG subset, tested in this sandbox), and
    raises NotImplementedError for non-PNG payloads without PIL.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        tag = f"|{width}x{height}".encode()
        n = max(1, width * height // 64)

        def resize_payload_stub(p: bytes) -> bytes:
            # deterministic fake of the real output size
            seed = hashlib.sha1(bytes(p) + tag).digest()
            return (seed * (n // len(seed) + 1))[:n]

        def resize_payload_real(p: bytes) -> bytes:
            import io
            if _PILImage is not None:
                im = _PILImage.open(io.BytesIO(bytes(p)))
                return im.resize((width, height), _pil_nearest()).tobytes()
            arr = _png.decode_png(bytes(p))  # raises for non-PNG
            out = _png.resize_nearest(arr, width, height)
            # PIL keeps single-channel modes 2-D; match its tobytes()
            return np.ascontiguousarray(
                out[:, :, 0] if out.shape[2] == 1 else out).tobytes()

        resize_payload = (resize_payload_stub if decode_stub
                          else resize_payload_real)

        for pdf in batches:
            # column-wise: boolean-mask selection + .map over ONLY the
            # image payloads — the batch shape a real decoder inherits
            # (per-image decode cost is irreducible; everything else is
            # vectorized pandas, no row-wise apply over the frame)
            out = pdf.copy()
            mask = (pdf["kind"] == "image") & pdf["payload"].notna()
            if mask.any():
                out.loc[mask, "payload"] = \
                    pdf.loc[mask, "payload"].map(resize_payload)
                out.loc[mask, "width"] = width
                out.loc[mask, "height"] = height
            yield out[["media_id", "kind", "payload", "mime", "width",
                       "height", "duration_ms"]]

    return media.mapInPandas(run, schema=RESIZED_SCHEMA)
