"""Multimodal (image/audio/video) column plumbing.

The engine treats media as opaque ``binary`` content plus a typed
metadata struct — the schema/partitioning/UDF-batch shape is real and
tested. Decoding is REAL in-container for WAV / PPM / 24-bit BMP
(:mod:`.codecs` — stdlib wave + struct/numpy, gates
``multimodal_{wav,image}_decode``); compressed formats (JPEG/PNG/
MP3/MP4) need pillow/librosa/av, which are not in this container, so
those route through the ``decode=...`` injection seam (SURVEY.md §7
"LLM-pipeline extras"; the reference has no multimodal surface —
this is a scale-pipeline extension).

Patterns demonstrated:
- binary column + ``struct<fmt,width,height,sample_rate>`` metadata;
- ``mapInPandas`` over Arrow record batches for per-blob feature
  extraction (1 output row per input row) and frame sampling
  (N output rows per input row) — the two batch shapes a real
  decode/resize/frame-sample pipeline needs;
- deterministic fake "decode" so tests and DuckDB oracles can verify
  the plumbing end-to-end byte-for-byte.
"""

from __future__ import annotations

import hashlib
from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

FEATURE_SCHEMA = ("doc_id bigint, n_bytes int, digest string, "
                  "head_word bigint, mean_byte double")
FRAME_SCHEMA = "doc_id bigint, frame_no int, frame_digest string"

FRAME_STRIDE = 32
FRAME_LEN = 16


def attach_binary(df: DataFrame, id_col: str = "doc_id",
                  text_col: str = "text") -> DataFrame:
    """Model a media table: opaque binary content + typed metadata.
    Content bytes are the utf-8 text (deterministic stand-in for real
    image/audio blobs); metadata derives from the id."""
    fmt = F.element_at(F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
                       (F.col(id_col) % 3 + 1).cast("int"))
    meta = F.struct(
        fmt.alias("fmt"),
        (16 + F.col(id_col) % 64).cast("int").alias("width"),
        (16 + (F.col(id_col) * 7) % 64).cast("int").alias("height"),
        F.when(fmt == "audio", F.lit(16000)).otherwise(F.lit(0))
         .cast("int").alias("sample_rate"))
    return df.select(F.col(id_col),
                     F.col(text_col).cast("binary").alias("content"),
                     meta.alias("meta"))


def decode_media(content: bytes, fmt: str):
    """REAL decode path. Container-built-in formats decode for real —
    WAV (stdlib wave), PPM and 24-bit BMP (struct+numpy) via
    :mod:`..functions.codecs` (gate ``multimodal_wav_decode`` proves
    encode → decode → aggregate exact against a SQL oracle).
    Compressed formats (JPEG/PNG/MP3/MP4) still require pillow /
    librosa / av, none of which ship here — those blobs raise so the
    caller routes them through the ``extract_features(decode=...)``
    injection seam."""
    from .codecs import sniff_and_decode
    try:
        return sniff_and_decode(content)
    except NotImplementedError:
        raise NotImplementedError(
            f"real {fmt} decode for this blob needs pillow/librosa/av; "
            "inject via extract_features(decode=...) or use fake_decode")


def fake_decode(content: bytes) -> dict:
    """Deterministic stand-in for decode: byte-level features that a
    DuckDB oracle can recompute (digest, leading-word, mean byte)."""
    md5 = hashlib.md5(content).hexdigest()
    return {
        "n_bytes": len(content),
        "digest": md5,
        "head_word": int(md5[:8], 16),
        "mean_byte": sum(content) / len(content) if content else 0.0,
    }


def extract_features(df: DataFrame,
                     decode: Callable[[bytes], dict] = fake_decode,
                     schema: str = FEATURE_SCHEMA) -> DataFrame:
    """Per-blob feature extraction via mapInPandas (1 row in → 1 row
    out). At scale: Arrow batches keep blobs off the Python heap until
    their batch is processed; repartition upstream for balance.

    ``decode`` is the injection seam for a real media decoder: pass a
    callable ``bytes -> dict`` (e.g. pillow/librosa-backed) whose keys
    match ``schema`` (minus the leading doc_id). The callable is
    serialized into the Arrow worker with the closure, so it must be
    importable/picklable; the default stays the deterministic fake so
    oracle hashes are stable without media libraries."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            feats = [decode(bytes(c)) for c in pdf["content"]]
            # mean_byte stays unrounded: int-sum / int-len is the same
            # IEEE double in any engine, while ROUND ties (x.xxxx5)
            # split between half-even and half-away semantics
            out = pd.DataFrame(feats)
            out.insert(0, "doc_id", pdf["doc_id"].values)
            yield out

    return df.mapInPandas(batches, schema)


def _digest_frame(frame: bytes) -> dict:
    return {"frame_digest": hashlib.md5(frame).hexdigest()}


def sample_frames(df: DataFrame, stride: int = FRAME_STRIDE,
                  frame_len: int = FRAME_LEN,
                  frame_features: Callable[[bytes], dict] = _digest_frame,
                  schema: str = FRAME_SCHEMA) -> DataFrame:
    """Frame sampling via mapInPandas (1 row in → N rows out): fixed
    stride over the byte stream, one feature row per frame — the batch
    shape of real video frame extraction.

    ``frame_features`` is the per-frame injection seam (e.g. an
    av/ffmpeg keyframe decoder emitting pixels or embeddings); its
    keys must match ``schema`` minus the leading doc_id/frame_no. The
    default digests the raw frame bytes so the gate oracle can replay
    the output without media libraries."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows: list[dict] = []
            for doc_id, content in zip(pdf["doc_id"], pdf["content"]):
                raw = bytes(content)
                k = 0
                while k * stride + frame_len <= len(raw):
                    frame = raw[k * stride:k * stride + frame_len]
                    rows.append({"doc_id": doc_id, "frame_no": k,
                                 **frame_features(frame)})
                    k += 1
            yield pd.DataFrame(
                rows, columns=[f.split()[0].strip()
                               for f in schema.split(",")])

    return df.mapInPandas(batches, schema)
