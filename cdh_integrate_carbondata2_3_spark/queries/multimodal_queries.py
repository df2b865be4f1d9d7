"""Multimodal-column queries with DuckDB oracles.

The binary content is the documents' utf-8 text (ASCII in this
corpus, so byte offsets == char offsets and the oracle can recompute
every byte-level feature with substr/md5/ascii in SQL). The Spark
side runs the REAL plumbing — binary column, metadata struct,
mapInPandas Arrow batches — not the SQL shortcut.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.multimodal import (
    FRAME_LEN,
    FRAME_STRIDE,
    attach_binary,
    extract_features,
    sample_frames,
)
from . import query
from .pipeline import _docs


def _spread(df: DataFrame) -> DataFrame:
    """Fan a small frame out to one partition per available core
    before a CPU-bound codec stage. Tiny parquet inputs plan as a
    single input split (maxPartitionBytes is byte-based), which
    serializes the synth-encode/decode mapInPandas work on one task
    while every other core idles — the classic "partitioning tuned
    for bytes, not CPU" straggler (guide §2). defaultParallelism
    follows the session's core count (the driver benches at several
    core counts), so the fan-out is scale-adaptive, and the shuffled
    frame is ids+source only — the blobs are synthesized AFTER the
    exchange, so nothing heavy moves.

    Applied ONLY where a same-session A/B showed the codec work
    outweighs the exchange + per-task Arrow overhead (min-of-3 at
    sf0.1 on local[32]): jpeg 3.27→1.31 s, av_meta 1.51→1.01 s,
    png 1.13→0.98 s. wav (0.75→1.05 s) and image/PPM+BMP
    (0.65→1.01 s) decode too fast to pay for the fan-out — those
    gates keep the single-split plan."""
    return df.repartition(df.sparkSession.sparkContext.defaultParallelism)


def _head_word_sql(h: str) -> str:
    """int(md5_hex[:8], 16) from hex chars (no hex-parse builtin needed)."""
    terms = [
        f"(strpos('0123456789abcdef', substr({h}, {p + 1}, 1)) - 1) * {16 ** (7 - p)}"
        for p in range(8)]
    return "(" + " + ".join(terms) + ")"


@query("multimodal_feature_extract", oracle=f"""
SELECT doc_id,
       CAST(length(text) AS INT) AS n_bytes,
       md5(text) AS digest,
       CAST({_head_word_sql('md5(text)')} AS BIGINT) AS head_word,
       CAST(list_aggregate(list_transform(generate_series(1, length(text)),
                                          i -> ascii(substr(text, i, 1))),
                           'sum') / CAST(length(text) AS DOUBLE) AS DOUBLE) AS mean_byte
FROM documents
""")
def multimodal_feature_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Blob → features through the real mapInPandas path (binary
    column in, Arrow batch, one feature row per blob)."""
    media = attach_binary(_docs(spark, sf_dir))
    return extract_features(media.select("doc_id", "content"))


@query("multimodal_frame_sample", oracle=f"""
SELECT doc_id,
       CAST(k AS INT) AS frame_no,
       md5(substr(text, k * {FRAME_STRIDE} + 1, {FRAME_LEN})) AS frame_digest
FROM documents,
     unnest(generate_series(0, CAST(floor((length(text) - {FRAME_LEN})
                                          / {FRAME_STRIDE}.0) AS BIGINT))) AS t(k)
""", spark_oracle=f"""
SELECT doc_id,
       CAST(k AS INT) AS frame_no,
       md5(substr(text, k * {FRAME_STRIDE} + 1, {FRAME_LEN})) AS frame_digest
FROM documents
LATERAL VIEW explode(
  CASE WHEN length(text) >= {FRAME_LEN}
       THEN sequence(0, CAST(floor((length(text) - {FRAME_LEN})
                                   / {FRAME_STRIDE}.0) AS INT))
       ELSE CAST(array() AS ARRAY<INT>) END) t AS k
""")
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Blob → N frames through mapInPandas (video frame-sampling batch
    shape: strided slices of the byte stream, one digest per frame)."""
    media = attach_binary(_docs(spark, sf_dir))
    return sample_frames(media.select("doc_id", "content"))


@query("multimodal_meta_stats", oracle="""
SELECT CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS fmt,
       COUNT(*) AS n_blobs,
       CAST(SUM(length(text)) AS BIGINT) AS total_bytes,
       CAST(ROUND(AVG(16 + doc_id % 64), 3) AS DOUBLE) AS avg_width,
       CAST(MAX(16 + (doc_id * 7) % 64) AS INT) AS max_height
FROM documents
GROUP BY 1
""")
def multimodal_meta_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Typed-metadata struct surface: group by nested field, aggregate
    over struct members + blob sizes (all JVM-side)."""
    media = attach_binary(_docs(spark, sf_dir))
    return (media.groupBy(F.col("meta.fmt").alias("fmt"))
            .agg(F.count(F.lit(1)).alias("n_blobs"),
                 F.sum(F.length("content")).alias("total_bytes"),
                 F.round(F.avg("meta.width"), 3).cast("double").alias("avg_width"),
                 F.max("meta.height").alias("max_height")))


@query("multimodal_wav_decode", oracle="""
WITH samp AS (
    SELECT doc_id, source,
           ((doc_id * 31 + i * 7) % 65536) - 32768 AS s
    FROM documents,
         unnest(generate_series(0, 50 + doc_id % 64 - 1)) AS t(i))
SELECT source,
       CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_blobs,
       COUNT(*) AS total_samples,
       CAST(SUM(s) AS BIGINT) AS total_amplitude
FROM samp
GROUP BY source
""")
def multimodal_wav_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL audio decode end-to-end — no media libraries: each doc_id
    deterministically generates PCM16 samples, a stdlib-wave WAV blob
    is built per row inside one Arrow batch stage, and the engine's
    built-in RIFF/WAVE decoder (functions/codecs.decode_wav, reached
    through the magic-byte sniffer) decodes it back inside the
    mapInPandas feature extractor. The oracle recomputes the sample
    formula in SQL, so a green hash proves encode → REAL decode →
    aggregate is exact. Compressed formats keep the documented
    library-injection seam (sniff raises for unknown magic)."""
    import pandas as pd

    from ..functions.codecs import encode_wav_pcm16, sniff_and_decode
    from ..functions.multimodal import extract_features

    def attach(it):
        for pdf in it:
            blobs = []
            for d in pdf["doc_id"]:
                d = int(d)
                n = 50 + d % 64
                blobs.append(encode_wav_pcm16(
                    [((d * 31 + i * 7) % 65536) - 32768 for i in range(n)],
                    sample_rate=16000))
            yield pd.DataFrame({"doc_id": pdf["doc_id"],
                                "source": pdf["source"],
                                "content": blobs})

    base = _docs(spark, sf_dir).select("doc_id", "source")
    media = base.mapInPandas(
        attach, "doc_id bigint, source string, content binary")

    def wav_features(content: bytes) -> dict:
        d = sniff_and_decode(content)
        return {"n_samples": d["n_samples"],
                "sum_samples": d["sum_samples"]}

    feats = extract_features(
        media.select("doc_id", "content"), decode=wav_features,
        schema="doc_id bigint, n_samples bigint, sum_samples bigint")
    # join source from the RAW docs frame, not media — joining media
    # would re-run the attach stage and synthesize every blob twice
    return (feats.join(base, "doc_id")
            .groupBy("source")
            .agg(F.count(F.lit(1)).alias("n_blobs"),
                 F.sum("n_samples").alias("total_samples"),
                 F.sum("sum_samples").alias("total_amplitude")))


@query("multimodal_image_decode", oracle="""
WITH px AS (
    SELECT doc_id, source, i,
           (doc_id * 13 + i * 5) % 256 AS v
    FROM documents,
         unnest(generate_series(
             0, (4 + doc_id % 8) * (3 + doc_id % 5) * 3 - 1)) AS t(i))
SELECT source,
       CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_imgs,
       CAST(COUNT(*) / 3 AS BIGINT) AS total_px,
       CAST(SUM(CASE WHEN i % 3 = 0 THEN v ELSE 0 END) AS BIGINT) AS sum_r,
       CAST(SUM(CASE WHEN i % 3 = 2 THEN v ELSE 0 END) AS BIGINT) AS sum_b
FROM px
GROUP BY source
""")
def multimodal_image_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL image decode end-to-end — no media libraries: per doc a
    binary PPM (P6) blob is synthesized from a pixel formula
    (interleaved RGB bytes, w/h derived from doc_id), parsed back by
    the engine's built-in PPM decoder (functions/codecs.decode_ppm
    via the magic-byte sniffer) inside the Arrow feature extractor;
    per-source image counts, pixel counts (from the DECODED
    dimensions), and R/B channel sums hash-check against the formula
    recomputed in SQL over the exploded byte index."""
    import pandas as pd

    from ..functions.codecs import sniff_and_decode
    from ..functions.multimodal import extract_features

    def attach(it):
        for pdf in it:
            blobs = []
            for d in pdf["doc_id"]:
                d = int(d)
                w, h = 4 + d % 8, 3 + d % 5
                body = bytes(((d * 13 + i * 5) % 256)
                             for i in range(w * h * 3))
                blobs.append(f"P6\n{w} {h}\n255\n".encode() + body)
            yield pd.DataFrame({"doc_id": pdf["doc_id"],
                                "source": pdf["source"],
                                "content": blobs})

    base = _docs(spark, sf_dir).select("doc_id", "source")
    media = base.mapInPandas(
        attach, "doc_id bigint, source string, content binary")

    def img_features(content: bytes) -> dict:
        d = sniff_and_decode(content)
        return {"w": d["width"], "h": d["height"],
                "sum_r": d["sum_r"], "sum_b": d["sum_b"]}

    feats = extract_features(
        media.select("doc_id", "content"), decode=img_features,
        schema="doc_id bigint, w int, h int, sum_r bigint, sum_b bigint")
    # join source from the raw docs frame — see multimodal_wav_decode
    return (feats.join(base, "doc_id")
            .groupBy("source")
            .agg(F.count(F.lit(1)).alias("n_imgs"),
                 F.sum(F.col("w").cast("bigint") * F.col("h"))
                 .alias("total_px"),
                 F.sum("sum_r").alias("sum_r"),
                 F.sum("sum_b").alias("sum_b")))


@query("multimodal_png_decode", oracle="""
WITH px AS (
    SELECT doc_id, source, i,
           (doc_id * 17 + i * 3) % 256 AS v
    FROM documents,
         unnest(generate_series(
             0, (4 + doc_id % 6) * (3 + doc_id % 4) * 3 - 1)) AS t(i))
SELECT source,
       CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_imgs,
       CAST(COUNT(*) / 3 AS BIGINT) AS total_px,
       CAST(SUM(CASE WHEN i % 3 = 0 THEN v ELSE 0 END) AS BIGINT) AS sum_r,
       CAST(SUM(CASE WHEN i % 3 = 1 THEN v ELSE 0 END) AS BIGINT) AS sum_g,
       CAST(SUM(CASE WHEN i % 3 = 2 THEN v ELSE 0 END) AS BIGINT) AS sum_b
FROM px
GROUP BY source
""")
def multimodal_png_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL compressed-image decode end-to-end — no image library:
    per doc an RGB pixel array from a deterministic formula is
    DEFLATE-compressed into a PNG (functions/codecs.encode_png) with
    the scanline filter CYCLING per row (None/Sub/Up/Average/Paeth —
    every unfilter path runs in the gate), then decoded back by the
    engine's stdlib-zlib PNG decoder through the magic-byte sniffer
    inside the Arrow feature extractor. Per-source image counts,
    pixel counts from the DECODED dimensions, and all three channel
    sums hash-check against the pixel formula recomputed in SQL —
    a green hash proves chunk walk + CRC + inflate + unfilter are
    exact. (VERDICT r6 'Next round' item 4.)"""
    import numpy as np
    import pandas as pd

    from ..functions.codecs import encode_png, sniff_and_decode
    from ..functions.multimodal import extract_features

    def attach(it):
        for pdf in it:
            blobs = []
            for d in pdf["doc_id"]:
                d = int(d)
                w, h = 4 + d % 6, 3 + d % 4
                flat = ((d * 17 + np.arange(w * h * 3) * 3) % 256)
                blobs.append(encode_png(
                    flat.astype(np.uint8).reshape(h, w, 3),
                    filters=[(d + y) % 5 for y in range(h)]))
            yield pd.DataFrame({"doc_id": pdf["doc_id"],
                                "source": pdf["source"],
                                "content": blobs})

    base = _docs(spark, sf_dir).select("doc_id", "source")
    media = _spread(base).mapInPandas(
        attach, "doc_id bigint, source string, content binary")

    def png_features(content: bytes) -> dict:  # noqa: D401
        d = sniff_and_decode(content)
        return {"w": d["width"], "h": d["height"], "sum_r": d["sum_r"],
                "sum_g": d["sum_g"], "sum_b": d["sum_b"]}

    feats = extract_features(
        media.select("doc_id", "content"), decode=png_features,
        schema=("doc_id bigint, w int, h int, sum_r bigint, "
                "sum_g bigint, sum_b bigint"))
    # join source from the raw docs frame — see multimodal_wav_decode
    return (feats.join(base, "doc_id")
            .groupBy("source")
            .agg(F.count(F.lit(1)).alias("n_imgs"),
                 F.sum(F.col("w").cast("bigint") * F.col("h"))
                 .alias("total_px"),
                 F.sum("sum_r").alias("sum_r"),
                 F.sum("sum_g").alias("sum_g"),
                 F.sum("sum_b").alias("sum_b")))


@query("multimodal_jpeg_decode", oracle="""
WITH tiles AS (
    SELECT doc_id, source, i,
           128 + 2 * ((doc_id * 7 + i * 3) % 51 - 25) AS v
    FROM documents,
         unnest(generate_series(
             0, (2 + doc_id % 3) * (1 + doc_id % 2) - 1)) AS t(i))
SELECT source,
       CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_imgs,
       CAST(COUNT(*) * 64 AS BIGINT) AS total_px,
       CAST(SUM(v * 64) AS BIGINT) AS sum_r,
       CAST(SUM(v * 64) AS BIGINT) AS sum_b
FROM tiles GROUP BY source
""")
def multimodal_jpeg_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL baseline-JPEG decode end-to-end — no image library: per
    doc an image of flat 8×8 gray tiles (values from a deterministic
    formula, even offsets from 128 so the DC quantization is exact
    and chroma is exactly 128) is DCT-encoded into a baseline JPEG
    (functions/jpeg.encode_jpeg — Annex-K quant tables, per-image
    canonical Huffman written to DHT, restart markers on every 4th
    doc), then decoded back by the engine's stdlib+numpy JPEG decoder
    (marker walk → Huffman entropy decode → dequantize → IDCT →
    YCbCr→RGB) through the magic-byte sniffer inside the Arrow
    feature extractor. Flat tiles make the lossy codec bit-exact, so
    per-source channel sums hash-check against the tile formula
    recomputed in SQL — a green hash proves the ENTIRE pipeline
    (both Huffman directions, quantization, both DCT directions,
    color transform) is exact on this family."""
    import numpy as np
    import pandas as pd

    from ..functions.codecs import sniff_and_decode
    from ..functions.jpeg import encode_jpeg
    from ..functions.multimodal import extract_features

    def attach(it):
        for pdf in it:
            blobs = []
            for d in pdf["doc_id"]:
                d = int(d)
                tw, th = 2 + d % 3, 1 + d % 2
                t = np.arange(tw * th)
                v = 128 + 2 * ((d * 7 + t * 3) % 51 - 25)
                tiles = v.reshape(th, tw)
                img = np.repeat(np.repeat(tiles, 8, axis=0), 8, axis=1)
                rgb = np.stack([img] * 3, axis=2).astype(np.uint8)
                blobs.append(encode_jpeg(
                    rgb, restart_interval=2 if d % 4 == 0 else 0))
            yield pd.DataFrame({"doc_id": pdf["doc_id"],
                                "source": pdf["source"],
                                "content": blobs})

    base = _docs(spark, sf_dir).select("doc_id", "source")
    media = _spread(base).mapInPandas(
        attach, "doc_id bigint, source string, content binary")

    def jpeg_features(content: bytes) -> dict:
        d = sniff_and_decode(content)
        # gray input ⇒ the three decoded channels must agree exactly;
        # a YCbCr/chroma bug would break this before the hash could
        assert d["sum_r"] == d["sum_g"] == d["sum_b"], \
            "JPEG gray decode channels diverged"
        return {"w": d["width"], "h": d["height"],
                "sum_r": d["sum_r"], "sum_b": d["sum_b"]}

    feats = extract_features(
        media.select("doc_id", "content"), decode=jpeg_features,
        schema=("doc_id bigint, w int, h int, sum_r bigint, "
                "sum_b bigint"))
    # join source from the raw docs frame — see multimodal_wav_decode
    return (feats.join(base, "doc_id")
            .groupBy("source")
            .agg(F.count(F.lit(1)).alias("n_imgs"),
                 F.sum(F.col("w").cast("bigint") * F.col("h"))
                 .alias("total_px"),
                 F.sum("sum_r").alias("sum_r"),
                 F.sum("sum_b").alias("sum_b")))


@query("multimodal_av_meta", oracle="""
SELECT source,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(((20 + doc_id % 40) * 1152 * 1000) // 44100) AS BIGINT)
         AS mp3_ms,
       CAST(SUM(1000 * (1 + doc_id % 30)) AS BIGINT) AS mp4_ms,
       CAST(SUM(16 * (2 + doc_id % 5)) AS BIGINT) AS sum_width
FROM documents GROUP BY source
""")
def multimodal_av_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL audio/video CONTAINER parsing — no media libraries: per
    doc a syntactically-valid MPEG-1 Layer III frame stream and an
    ISO-BMFF (MP4) box tree are synthesized from doc_id formulas,
    then parsed back by the engine's stdlib parsers
    (codecs.decode_mp3_meta — frame-header walk with the real
    bitrate/samplerate/padding arithmetic; codecs.decode_mp4_meta —
    big-endian box walk through ftyp/moov/mvhd/trak/tkhd/mdhd)
    through the magic-byte sniffer. Durations and track dimensions
    hash-check against the formulas recomputed in SQL, so a green
    hash proves the header arithmetic (samples-per-frame × frames /
    rate; movie duration / timescale; 16.16 fixed-point dims) is
    exact. Sample-level audio/video DECODE stays behind the
    documented injection seam."""
    import pandas as pd

    from ..functions.codecs import (encode_mp3_frames, encode_mp4_meta,
                                    sniff_and_decode)
    from ..functions.multimodal import extract_features

    def attach(it):
        for pdf in it:
            mp3s, mp4s = [], []
            for d in pdf["doc_id"]:
                d = int(d)
                mp3s.append(encode_mp3_frames(20 + d % 40))
                mp4s.append(encode_mp4_meta(
                    duration_ms=1000 * (1 + d % 30),
                    width=16 * (2 + d % 5), height=16 * (1 + d % 4)))
            yield pd.DataFrame({"doc_id": pdf["doc_id"],
                                "source": pdf["source"],
                                "mp3": mp3s, "mp4": mp4s})

    base = _docs(spark, sf_dir).select("doc_id", "source")
    media = _spread(base).mapInPandas(
        attach, "doc_id bigint, source string, mp3 binary, mp4 binary")

    def av_features(mp3: bytes, mp4: bytes) -> dict:
        a = sniff_and_decode(mp3)
        v = sniff_and_decode(mp4)
        assert a["kind"] == "audio" and v["kind"] == "video"
        return {"mp3_ms": a["duration_ms"], "mp4_ms": v["duration_ms"],
                "width": v["tracks"][0]["width"]}

    def extract(it):
        for pdf in it:
            rows = [av_features(m3, m4)
                    for m3, m4 in zip(pdf["mp3"], pdf["mp4"])]
            yield pd.DataFrame({
                "doc_id": pdf["doc_id"],
                "mp3_ms": [r["mp3_ms"] for r in rows],
                "mp4_ms": [r["mp4_ms"] for r in rows],
                "width": [r["width"] for r in rows]})

    feats = media.mapInPandas(
        extract, "doc_id bigint, mp3_ms bigint, mp4_ms bigint, width int")
    return (feats.join(base, "doc_id")
            .groupBy("source")
            .agg(F.count(F.lit(1)).alias("n_docs"),
                 F.sum("mp3_ms").alias("mp3_ms"),
                 F.sum("mp4_ms").alias("mp4_ms"),
                 F.sum(F.col("width").cast("bigint")).alias("sum_width")))
