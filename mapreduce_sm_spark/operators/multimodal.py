"""Multimodal-column plumbing (north-star extension §2.C).

Images/audio/video are opaque `binary` columns with typed metadata. The
Spark-side plumbing — binary schema, Arrow-batched mapInPandas, partition
shape — is real and tested. The codec is PLUGGABLE: `decode_meta(...,
codec='pil')` is a real Pillow decode (exercised by a skipif-guarded test;
this container ships no image libraries), `codec='fake'` is a deterministic
md5-derived stand-in used by the registered queries because the fixture
payloads are text bytes, and `codec='auto'` picks pil when importable. At
100 TB the decode is embarrassingly parallel map-side work: no shuffle,
batch size bounded by Arrow batch bytes.

The fake decode derives metadata from an md5 of the payload, which the
DuckDB oracle reproduces — so even the mapInPandas path is hash-checked.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mapreduce_sm_spark.registry import REGISTRY
from mapreduce_sm_spark.session import table


def have_pil() -> bool:
    """True when a real image codec (Pillow) is importable."""
    try:
        import PIL.Image  # noqa: F401

        return True
    except ImportError:
        return False


def _pil_decode_meta(payload: bytes) -> tuple[int, int, int, int]:
    """Real codec branch: decode with Pillow, perceptual 8x8 average-hash.

    Exercised by tests/test_multimodal.py (skipif-guarded — this container
    ships no Pillow); the registered queries keep the deterministic fake
    because the fixture payloads are text bytes, not images.
    """
    import io

    from PIL import Image

    img = Image.open(io.BytesIO(payload))
    width, height = img.size
    channels = len(img.getbands())
    small = img.convert("L").resize((8, 8))
    px = list(small.getdata())
    avg = sum(px) / 64.0
    bits = sum(1 << i for i, p in enumerate(px) if p >= avg)
    return width, height, channels, bits % 1_000_000_007


def _fake_decode_meta(payload: bytes) -> tuple[int, int, int, int]:
    """Deterministic fake codec: derives (width, height, channels, phash)
    from md5(payload) so results are reproducible and oracle-checkable
    (the DuckDB oracle replays the identical md5 arithmetic)."""
    h = int(hashlib.md5(payload).hexdigest()[:15], 16)
    width = h % 1920 + 1
    height = (h // 1920) % 1080 + 1
    channels = h % 3 + 1
    phash = h % 1_000_000_007
    return width, height, channels, phash


def decode_meta(payload: bytes, codec: str = "fake") -> tuple[int, int, int, int]:
    """Dispatch: 'pil' -> real Pillow decode, 'fake' -> deterministic stub,
    'auto' -> pil when importable else fake."""
    if codec == "auto":
        codec = "pil" if have_pil() else "fake"
    if codec == "pil":
        return _pil_decode_meta(payload)
    if codec == "fake":
        return _fake_decode_meta(payload)
    raise NotImplementedError(f"unknown codec {codec!r}")


def _decode_batches(codec: str = "fake"):
    """Arrow-batched decode kernel for mapInPandas, parameterized by codec
    so the same plumbing serves real images ('pil'/'auto') and the
    oracle-checkable fixture path ('fake')."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            metas = [decode_meta(p, codec) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].astype("int64"),
                    "n_bytes": pdf["payload"].map(len).astype("int64"),
                    "width": pd.Series([m[0] for m in metas], dtype="int64"),
                    "height": pd.Series([m[1] for m in metas], dtype="int64"),
                    "channels": pd.Series([m[2] for m in metas], dtype="int64"),
                    "phash": pd.Series([m[3] for m in metas], dtype="int64"),
                }
            )

    return gen


# The oracle mirrors the md5 arithmetic of the fake decode. payload is the
# utf-8 encoding of `text`, so md5(payload) == md5(text).
_H = "('0x' || substr(md5(text), 1, 15))::BIGINT"

_MM_ORACLE = f"""
SELECT doc_id,
       strlen(text) AS n_bytes,
       {_H} % 1920 + 1 AS width,
       ({_H} // 1920) % 1080 + 1 AS height,
       {_H} % 3 + 1 AS channels,
       {_H} % 1000000007 AS phash
FROM documents
ORDER BY doc_id
"""


@REGISTRY.register(
    "multimodal_image_meta",
    oracle=_MM_ORACLE,
    description="binary-column decode plumbing: Arrow mapInPandas over payload bytes",
    tags=("multimodal", "pandas-udf"),
)
def multimodal_image_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    # payload: a real BinaryType column (stands in for image bytes)
    payloads = table(spark, sf_dir, "documents").select(
        "doc_id", F.encode(F.col("text"), "utf-8").alias("payload")
    )
    decoded = payloads.mapInPandas(
        _decode_batches("fake"),  # fixture payloads are text bytes, not images
        schema="doc_id long, n_bytes long, width long, height long, "
        "channels long, phash long",
    )
    return decoded.orderBy("doc_id")


def image_meta_over(payloads: DataFrame, codec: str = "auto") -> DataFrame:
    """Public entry for real data: (doc_id, payload binary) -> decoded meta
    via Pillow when available. Same plan shape as the registered query."""
    return payloads.mapInPandas(
        _decode_batches(codec),
        schema="doc_id long, n_bytes long, width long, height long, "
        "channels long, phash long",
    )


# --- video frame sampling stub -------------------------------------------

_FRAME_BYTES = 64  # fake fixed-size frames inside the payload
_SAMPLE_EVERY = 8


def _sample_frames(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """STUB codec: treats the payload as a stream of 64-byte 'frames' and
    samples every 8th; a real build would call ffmpeg/pyav here (absent in
    this container — see module docstring)."""
    for pdf in batches:
        rows = []
        for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
            n_frames = len(payload) // _FRAME_BYTES
            sampled = list(range(0, n_frames, _SAMPLE_EVERY))
            first = (
                int.from_bytes(payload[:4], "big") if len(payload) >= 4 else 0
            )
            rows.append((int(doc_id), n_frames, len(sampled), first))
        yield pd.DataFrame(
            rows, columns=["doc_id", "n_frames", "n_sampled", "first_word"]
        )


_FRAMES_ORACLE = f"""
SELECT doc_id,
       strlen(text) // {_FRAME_BYTES} AS n_frames,
       CASE WHEN strlen(text) // {_FRAME_BYTES} = 0 THEN 0
            ELSE (strlen(text) // {_FRAME_BYTES} + {_SAMPLE_EVERY - 1}) // {_SAMPLE_EVERY}
       END AS n_sampled,
       CASE WHEN strlen(text) >= 4 THEN
         ascii(substr(text,1,1))*16777216 + ascii(substr(text,2,1))*65536
         + ascii(substr(text,3,1))*256 + ascii(substr(text,4,1))
       ELSE 0 END AS first_word
FROM documents
ORDER BY doc_id
"""


@REGISTRY.register(
    "multimodal_frame_sample",
    oracle=_FRAMES_ORACLE,
    description="video-style frame sampling plumbing over binary payloads",
    tags=("multimodal", "pandas-udf"),
)
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    payloads = table(spark, sf_dir, "documents").select(
        "doc_id", F.encode(F.col("text"), "utf-8").alias("payload")
    )
    return payloads.mapInPandas(
        _sample_frames,
        schema="doc_id long, n_frames long, n_sampled long, first_word long",
    ).orderBy("doc_id")


# --- resize + feature-extract stubs ---------------------------------------

_FIT = 256  # aspect-preserving fit box


def _resize_features(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """STUB codec: aspect-preserving resize plan + fake feature vector.
    A real build decodes pixels and runs the model here (libs absent —
    module docstring); the geometry/feature PLUMBING below is the real
    Spark-side contract: integer box fit, fixed-dim array<double> output."""
    rows = []
    for pdf in batches:
        for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
            w, h, _, _ = _fake_decode_meta(payload)
            m = max(w, h)
            if m <= _FIT:
                out_w, out_h = w, h
            else:
                out_w, out_h = (w * _FIT) // m, (h * _FIT) // m
            hh = int(hashlib.md5(payload).hexdigest()[:15], 16)
            # raw IEEE division of exact small ints — bit-identical to the
            # oracle's (k % 256)/255.0; a round() here would add the
            # Python-half-even vs DuckDB scaled-round tie channel
            feat = [((hh >> (8 * i)) & 255) / 255.0 for i in range(4)]
            rows.append((int(doc_id), out_w, out_h, feat))
        yield pd.DataFrame(
            rows, columns=["doc_id", "out_w", "out_h", "feat"]
        )
        rows = []


_RS_ORACLE = f"""
WITH meta AS (
  SELECT doc_id,
         {_H} % 1920 + 1 AS w,
         ({_H} // 1920) % 1080 + 1 AS h,
         {_H} AS hh
  FROM documents
)
SELECT doc_id,
       CASE WHEN greatest(w, h) <= {_FIT} THEN w
            ELSE (w * {_FIT}) // greatest(w, h) END AS out_w,
       CASE WHEN greatest(w, h) <= {_FIT} THEN h
            ELSE (h * {_FIT}) // greatest(w, h) END AS out_h,
       ((hh // 1) % 256) / 255.0 AS f0,
       ((hh // 256) % 256) / 255.0 AS f1,
       ((hh // 65536) % 256) / 255.0 AS f2,
       ((hh // 16777216) % 256) / 255.0 AS f3
FROM meta
ORDER BY doc_id
"""


@REGISTRY.register(
    "multimodal_resize_features",
    oracle=_RS_ORACLE,
    description="resize plan + feature-extract plumbing (fixed-dim vector out)",
    tags=("multimodal", "pandas-udf"),
)
def multimodal_resize_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    # The mapInPandas kernel emits the real contract — feat array<double> —
    # and resize_features_over() exposes it for pipeline use. The REGISTERED
    # query projects the vector to scalar columns because the external
    # driver's pandas canonicalizer cannot sort/hash list cells
    # (CORRECTNESS_r02: `TypeError: unhashable type: 'list'`).
    payloads = table(spark, sf_dir, "documents").select(
        "doc_id", F.encode(F.col("text"), "utf-8").alias("payload")
    )
    feats = payloads.mapInPandas(
        _resize_features,
        schema="doc_id long, out_w long, out_h long, feat array<double>",
    )
    return feats.select(
        "doc_id",
        "out_w",
        "out_h",
        *[F.col("feat")[i].alias(f"f{i}") for i in range(4)],
    ).orderBy("doc_id")


def resize_features_over(payloads: DataFrame) -> DataFrame:
    """Public entry for real data: (doc_id, payload binary) ->
    (doc_id, out_w, out_h, feat array<double>) — the vector stays a vector."""
    return payloads.mapInPandas(
        _resize_features,
        schema="doc_id long, out_w long, out_h long, feat array<double>",
    )


# --- audio metadata stub ---------------------------------------------------

_AUDIO_RATES = (8000, 16000, 22050, 44100)


def _audio_meta(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """STUB codec: derives (sample_rate, n_channels, duration_ms) from an
    md5 of the payload plus its byte length — a real build would parse the
    RIFF/WAV header or call soundfile here (absent in this container; the
    Spark-side plumbing — Arrow batching, schema, map-side-only shape — is
    the real contract, mirroring image_meta)."""
    for pdf in batches:
        rows = []
        for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
            h = int(hashlib.md5(payload).hexdigest()[:15], 16)
            rate = _AUDIO_RATES[h % len(_AUDIO_RATES)]
            channels = h % 2 + 1
            # fake PCM16: bytes / (rate * channels * 2) seconds
            duration_ms = (len(payload) * 1000) // (rate * channels * 2)
            rows.append((int(doc_id), len(payload), rate, channels, duration_ms))
        yield pd.DataFrame(
            rows,
            columns=["doc_id", "n_bytes", "sample_rate", "n_channels", "duration_ms"],
        )


_AUDIO_ORACLE = f"""
SELECT doc_id,
       strlen(text) AS n_bytes,
       (CASE {_H} % 4 WHEN 0 THEN 8000 WHEN 1 THEN 16000
                      WHEN 2 THEN 22050 ELSE 44100 END) AS sample_rate,
       {_H} % 2 + 1 AS n_channels,
       (strlen(text) * 1000) // (
         (CASE {_H} % 4 WHEN 0 THEN 8000 WHEN 1 THEN 16000
                        WHEN 2 THEN 22050 ELSE 44100 END)
         * ({_H} % 2 + 1) * 2) AS duration_ms
FROM documents
ORDER BY doc_id
"""


@REGISTRY.register(
    "multimodal_audio_meta",
    oracle=_AUDIO_ORACLE,
    description="audio-column decode plumbing: Arrow mapInPandas header parse (stub codec)",
    tags=("multimodal", "pandas-udf"),
)
def multimodal_audio_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    payloads = table(spark, sf_dir, "documents").select(
        "doc_id", F.encode(F.col("text"), "utf-8").alias("payload")
    )
    return payloads.mapInPandas(
        _audio_meta,
        schema="doc_id long, n_bytes long, sample_rate long, "
        "n_channels long, duration_ms long",
    ).orderBy("doc_id")
