"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

Design (per the build brief): the engine treats media as `binary` columns
with a metadata struct; decode / feature-extract / resize / frame-sample run
as Arrow-batched pandas functions over ``mapInPandas`` so each executor
processes whole record batches. ``decode=real`` runs REAL decoders for every
format decodable without codec libraries — BMP, PPM, PNG images and WAV PCM
audio, pure stdlib+numpy in media_codecs.py — and features come from the
decoded pixel/sample arrays; ``decode=fake`` keeps a deterministic
md5-derived stand-in (the replay-oracle form). Formats that genuinely need
codec libraries this container lacks (JPEG/MP3/H.264) plug in at the same
seam.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType(), False),
    T.StructField("uri", T.StringType(), True),
    T.StructField("media_type", T.StringType(), True),  # image | audio | video
    T.StructField("bytes", T.BinaryType(), True),
    T.StructField("meta", T.MapType(T.StringType(), T.StringType()), True),
])


def attach_media_meta(df: DataFrame, bytes_col: str = "bytes") -> DataFrame:
    """Cheap metadata without decoding: size + content hash (JVM-side)."""
    return (df.withColumn("media_size", F.length(F.col(bytes_col)))
              .withColumn("media_md5", F.md5(F.col(bytes_col))))


def _fake_feature(buf: bytes, dim: int) -> list[float]:
    """Deterministic stand-in for a decoded embedding: md5-seeded floats.
    The ':i' ASCII suffix keeps the derivation reproducible in any engine
    (the DuckDB oracle recomputes it with md5(text || ':i'))."""
    out = []
    h = buf or b""
    for i in range(dim):
        d = hashlib.md5(h + f":{i}".encode()).digest()
        out.append(int.from_bytes(d[:4], "big") / 2**32)
    return out


def extract_features(df: DataFrame, bytes_col: str = "bytes", dim: int = 8,
                     decode: str = "fake") -> DataFrame:
    """Decode + feature-extract via mapInPandas (Arrow batches).

    Output adds `features array<float>`. decode="real" parses actual
    BMP/PPM/PNG pixel arrays and WAV PCM samples (media_codecs.py — pure
    stdlib+numpy, no codec libraries) and emits [w, h, channel means] /
    [rate, frames, mean, rms] zero-padded to `dim`; decode="fake" keeps
    the deterministic md5-derived stand-in the replay oracles use.
    Formats beyond the stdlib-decodable four (JPEG/MP3/H.264...) would
    plug in at the same seam but need codec libs this container lacks.
    """
    if decode == "real":
        from .media_codecs import real_features as _feat
    elif decode == "fake":
        _feat = _fake_feature
    else:
        raise ValueError(f"decode must be 'real' or 'fake', got {decode!r}")

    fields = df.schema.fields + [T.StructField("features",
                                               T.ArrayType(T.FloatType()), True)]
    out_schema = T.StructType(fields)

    def batches(it):
        for pdf in it:
            pdf = pdf.copy()
            pdf["features"] = [
                _feat(b if isinstance(b, (bytes, bytearray)) else bytes(b or b""), dim)
                for b in pdf[bytes_col]
            ]
            yield pdf

    return df.mapInPandas(batches, out_schema)


def frame_sample(df: DataFrame, bytes_col: str = "bytes", every: int = 4,
                 frame_size: int = 256) -> DataFrame:
    """'Video' frame sampling over the raw byte stream: split bytes into
    frame_size chunks, keep every Nth — one output row per kept frame.
    Chunking is the real plumbing; a real decoder replaces the splitter."""
    chunks = F.transform(
        F.sequence(F.lit(0),
                   F.greatest((F.length(F.col(bytes_col)) - 1) / frame_size, F.lit(0)).cast("int")),
        lambda i: F.struct(
            i.alias("frame_no"),
            F.substring(F.col(bytes_col), i * frame_size + 1, frame_size).alias("frame")))
    kept = F.filter(chunks, lambda c: c["frame_no"] % every == 0)
    return (df.withColumn("__f", F.explode(kept))
              .withColumn("frame_no", F.col("__f.frame_no"))
              .withColumn("frame", F.col("__f.frame"))
              .drop("__f", bytes_col))


def resize_stub(df: DataFrame, bytes_col: str = "bytes",
                width: int = 224, height: int = 224) -> DataFrame:
    """Resize placeholder: tags rows with the target geometry and truncates
    the payload deterministically (real image lib would transform pixels)."""
    return (df.withColumn("resize_w", F.lit(width))
              .withColumn("resize_h", F.lit(height))
              .withColumn(bytes_col, F.substring(F.col(bytes_col), 1, width * height // 64)))
