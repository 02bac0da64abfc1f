"""Multimodal column handling (SURVEY.md §2.10): opaque binary payloads
with typed metadata, processed by Arrow-batched pandas UDFs.

Text and image (PNG/BMP header) decode are REAL — pure-stdlib struct
parsing, no codec libs needed. Audio/video decode stays a clearly
marked NotImplementedError gate (no ffmpeg in the container); the
Spark plumbing — binary+struct column model, mapInPandas batch
iteration, UDF schema contract, downstream relational aggregation —
is identical for every mime type, so a real pipeline drops PIL/ffmpeg
into ``_decode_payload`` without touching anything else.
"""

from __future__ import annotations

import struct
import zlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io import load_table
from ..registry import register

DECODED_SCHEMA = ("doc_id long, mime string, lang string, "
                  "n_bytes long, first_byte long, ok boolean")

PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _png_chunk(typ: bytes, data: bytes) -> bytes:
    return (struct.pack(">I", len(data)) + typ + data
            + struct.pack(">I", zlib.crc32(typ + data)))


def make_png(width: int, height: int, fill: int = 0x7F) -> bytes:
    """A valid 8-bit RGB PNG. IDAT uses zlib level 0 (stored blocks), so
    for raw size L = height*(1+3*width) <= 65535 the file size is the
    closed form 68 + L — which lets a SQL oracle verify byte accounting
    without running zlib."""
    ihdr = struct.pack(">IIBBBBB", width, height, 8, 2, 0, 0, 0)
    raw = b"".join(b"\x00" + bytes([fill]) * (3 * width) for _ in range(height))
    idat = zlib.compress(raw, 0)
    return (PNG_SIG + _png_chunk(b"IHDR", ihdr)
            + _png_chunk(b"IDAT", idat) + _png_chunk(b"IEND", b""))


def make_bmp(width: int, height: int, fill: int = 0x7F) -> bytes:
    """A valid bottom-up 24bpp BMP (BITMAPINFOHEADER). File size is
    54 + height * rowsize with rowsize = 4*floor((3*width+3)/4)."""
    rowsize = (3 * width + 3) // 4 * 4
    pixels = (bytes([fill]) * (3 * width)
              + b"\x00" * (rowsize - 3 * width)) * height
    file_size = 54 + len(pixels)
    header = (b"BM" + struct.pack("<IHHI", file_size, 0, 0, 54)
              + struct.pack("<IiiHHIIiiII", 40, width, height, 1, 24, 0,
                            len(pixels), 2835, 2835, 0, 0))
    return header + pixels


def parse_image_dims(payload: bytes, mime: str) -> tuple[int, int]:
    """Header-metadata decode for PNG and BMP — the byte-level parsing a
    100 TB image pipeline runs BEFORE any pixel decode (dedup by dims,
    filter thumbnails, route by size). Raises ValueError on a payload
    that doesn't match its declared mime."""
    if mime == "image/png":
        if payload[:8] != PNG_SIG or payload[12:16] != b"IHDR":
            raise ValueError("not a PNG")
        w, h = struct.unpack(">II", payload[16:24])
        return int(w), int(h)
    if mime == "image/bmp":
        if payload[:2] != b"BM":
            raise ValueError("not a BMP")
        w, h = struct.unpack("<ii", payload[18:26])
        return int(w), abs(int(h))
    raise ValueError(f"unsupported image mime: {mime}")


def _decode_payload(payload: bytes, mime: str) -> tuple[int, int, bool]:
    """Per-item decode kernel. Text and image headers decode for real;
    audio/video decode is GATED — the Spark-side contract (schema,
    batching, partitioning) is identical for all mime types."""
    if mime.startswith("text/"):
        return len(payload), payload[0] if payload else -1, True
    if mime in {"image/png", "image/bmp"}:
        w, h = parse_image_dims(payload, mime)
        return len(payload), w * h, True   # first_byte slot carries n_pixels
    if mime.split("/", 1)[0] in {"image", "audio", "video"}:
        raise NotImplementedError(
            f"no codec for {mime} in this container — plug PIL/ffmpeg in here")
    return len(payload), -1, False


def decode_multimodal(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas kernel: Arrow batch in → decoded feature batch out."""
    for pdf in batches:
        decoded = [_decode_payload(p, m) for p, m in zip(pdf["payload"], pdf["mime"])]
        yield pd.DataFrame({
            "doc_id": pdf["doc_id"].astype("int64"),
            "mime": pdf["mime"],
            "lang": pdf["lang"],
            "n_bytes": pd.Series([d[0] for d in decoded], dtype="int64"),
            "first_byte": pd.Series([d[1] for d in decoded], dtype="int64"),
            "ok": pd.Series([d[2] for d in decoded], dtype="bool"),
        })


def build_multimodal_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Model the corpus as a multimodal table: binary payload + mime +
    metadata struct — the layout image/audio shards would use at 100 TB
    (payloads stay opaque bytes until a task-specific decode stage)."""
    d = load_table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.encode("text", "UTF-8").alias("payload"),
        F.lit("text/plain").alias("mime"),
        F.col("lang"),
        F.create_map(F.lit("source"), F.col("source"),
                     F.lit("lang"), F.col("lang")).alias("meta"),
    )


@register("multimodal_image_meta", oracle="""
SELECT doc_id,
       CASE WHEN doc_id % 2 = 0 THEN 'image/bmp' ELSE 'image/png' END AS mime,
       CAST((n_chars % 64) + 8 AS BIGINT) AS width,
       CAST((doc_id % 32) + 8 AS BIGINT) AS height,
       CAST(CASE WHEN doc_id % 2 = 0
            THEN 54 + ((doc_id % 32) + 8)
                     * (((3 * ((n_chars % 64) + 8) + 3) // 4) * 4)
            ELSE 68 + ((doc_id % 32) + 8)
                     * (1 + 3 * ((n_chars % 64) + 8))
       END AS BIGINT) AS n_bytes
FROM documents
""", tags=("multimodal", "image"))
def multimodal_image_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Image-metadata extraction round trip, fully decoded — no stub:
    synthesize one REAL image per document (even doc_ids a 24bpp BMP,
    odd a zlib-level-0 PNG; dimensions derived from (n_chars, doc_id)),
    then parse the binary headers back in a second Arrow stage. The
    oracle recomputes width/height AND the exact file byte size in
    closed form from the source table, so a single flipped byte in
    either codec fails the gate.

    Both stages are mapInPandas over the binary column — the payload
    never leaves Arrow, the driver never sees a blob, and each batch is
    independent (embarrassingly parallel at 100 TB)."""

    def synth(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            doc_ids = pdf["doc_id"].astype("int64")
            widths = (pdf["n_chars"].astype("int64") % 64) + 8
            heights = (doc_ids % 32) + 8
            payloads, mimes = [], []
            for d, w, h in zip(doc_ids, widths, heights):
                if d % 2 == 0:
                    payloads.append(make_bmp(int(w), int(h)))
                    mimes.append("image/bmp")
                else:
                    payloads.append(make_png(int(w), int(h)))
                    mimes.append("image/png")
            yield pd.DataFrame({"doc_id": doc_ids, "mime": mimes,
                                "payload": payloads})

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            dims = [parse_image_dims(p, m)
                    for p, m in zip(pdf["payload"], pdf["mime"])]
            yield pd.DataFrame({
                "doc_id": pdf["doc_id"].astype("int64"),
                "mime": pdf["mime"],
                "width": pd.Series([d[0] for d in dims], dtype="int64"),
                "height": pd.Series([d[1] for d in dims], dtype="int64"),
                "n_bytes": pdf["payload"].map(len).astype("int64"),
            })

    d = load_table(spark, sf_dir, "documents").select("doc_id", "n_chars")
    images = d.mapInPandas(synth, "doc_id long, mime string, payload binary")
    return images.mapInPandas(
        extract, "doc_id long, mime string, width long, height long, n_bytes long")


@register("multimodal_ingest", oracle="""
SELECT 'text/plain' AS mime,
       lang,
       COUNT(*) AS n_items,
       CAST(SUM(n_chars) AS BIGINT) AS total_bytes,
       COUNT(*) AS n_ok
FROM documents
GROUP BY lang
""", tags=("multimodal",))
def multimodal_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal pipeline end-to-end: binary+metadata frame →
    mapInPandas decode → relational aggregate. The oracle checks the
    decoded byte accounting against the source table (the corpus is
    ASCII, so bytes == chars)."""
    mm = build_multimodal_frame(spark, sf_dir)
    decoded = mm.select("doc_id", "payload", "mime", "lang") \
        .mapInPandas(decode_multimodal, DECODED_SCHEMA)
    return (decoded.groupBy("mime", "lang")
            .agg(F.count(F.lit(1)).alias("n_items"),
                 F.sum("n_bytes").alias("total_bytes"),
                 F.sum(F.when(F.col("ok"), 1).otherwise(0)).alias("n_ok")))


def make_wav(sample_rate: int, n_samples: int) -> bytes:
    """A valid RIFF/WAVE file, PCM16 mono, deterministic sawtooth
    samples. File size is the closed form 44 + 2*n_samples, so a SQL
    oracle can verify byte accounting without parsing RIFF."""
    data = b"".join(struct.pack("<h", (i * 257) % 32768 - 16384)
                    for i in range(n_samples))
    byte_rate = sample_rate * 2
    return (b"RIFF" + struct.pack("<I", 36 + len(data)) + b"WAVE"
            + b"fmt " + struct.pack("<IHHIIHH", 16, 1, 1, sample_rate,
                                    byte_rate, 2, 16)
            + b"data" + struct.pack("<I", len(data)) + data)


def parse_wav_meta(payload: bytes) -> tuple[int, int, int]:
    """Header-metadata decode for WAV: (sample_rate, n_samples,
    duration_ms) — the audio analog of parse_image_dims (route/filter
    by duration before any costly signal decode)."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a WAV")
    if payload[12:16] != b"fmt ":
        raise ValueError("missing fmt chunk")
    _, fmt, channels, rate, _, block, bits = struct.unpack(
        "<IHHIIHH", payload[16:36])
    if fmt != 1:
        raise ValueError("not PCM")
    data_len = struct.unpack("<I", payload[40:44])[0]
    n_samples = data_len // block
    return int(rate), int(n_samples), n_samples * 1000 // rate


@register("multimodal_audio_meta", oracle="""
SELECT doc_id,
       CAST(8000 + (doc_id % 4) * 4000 AS BIGINT) AS sample_rate,
       CAST((n_chars % 100 + 10) * 16 AS BIGINT) AS n_samples,
       CAST(((n_chars % 100 + 10) * 16 * 1000)
            // (8000 + (doc_id % 4) * 4000) AS BIGINT) AS duration_ms,
       CAST(44 + 2 * (n_chars % 100 + 10) * 16 AS BIGINT) AS n_bytes
FROM documents
""", tags=("multimodal", "audio"))
def multimodal_audio_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio-metadata extraction round trip, fully decoded: synthesize
    one REAL PCM16 WAV per document (rate and length derived from
    (doc_id, n_chars)), then parse the RIFF headers back in a second
    Arrow stage. The oracle recomputes rate, sample count, integer
    duration, and the exact file byte size in closed form from the
    source table. Same two-stage mapInPandas shape as
    multimodal_image_meta — payloads never leave Arrow."""

    def synth(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            doc_ids = pdf["doc_id"].astype("int64")
            rates = 8000 + (doc_ids % 4) * 4000
            counts = (pdf["n_chars"].astype("int64") % 100 + 10) * 16
            payloads = [make_wav(int(r), int(n))
                        for r, n in zip(rates, counts)]
            yield pd.DataFrame({"doc_id": doc_ids, "payload": payloads})

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            metas = [parse_wav_meta(p) for p in pdf["payload"]]
            yield pd.DataFrame({
                "doc_id": pdf["doc_id"].astype("int64"),
                "sample_rate": pd.Series([m[0] for m in metas], dtype="int64"),
                "n_samples": pd.Series([m[1] for m in metas], dtype="int64"),
                "duration_ms": pd.Series([m[2] for m in metas], dtype="int64"),
                "n_bytes": pdf["payload"].map(len).astype("int64"),
            })

    d = load_table(spark, sf_dir, "documents").select("doc_id", "n_chars")
    wavs = d.mapInPandas(synth, "doc_id long, payload binary")
    return wavs.mapInPandas(
        extract, "doc_id long, sample_rate long, n_samples long, "
                 "duration_ms long, n_bytes long")


def make_mp4(timescale: int, duration: int) -> bytes:
    """A minimal valid ISO-BMFF (MP4) file: ftyp + moov(mvhd) + empty
    mdat. mvhd (version 0) carries the movie timescale and duration.
    File size is the closed form 24 + 116 + 8 = 148 bytes,
    letting a SQL oracle verify byte accounting without a video lib."""
    def box(typ: bytes, payload: bytes) -> bytes:
        return struct.pack(">I", 8 + len(payload)) + typ + payload

    ftyp = box(b"ftyp", b"isom" + struct.pack(">I", 512) + b"isomiso2")
    mvhd_payload = (b"\x00\x00\x00\x00"            # version+flags
                    + struct.pack(">II", 0, 0)      # ctime, mtime
                    + struct.pack(">II", timescale, duration)
                    + struct.pack(">I", 0x00010000)  # rate 1.0
                    + struct.pack(">H", 0x0100)      # volume
                    # Version-0 mvhd tail: reserved(2+8) + matrix(36)
                    # + pre_defined(24) + next_track_ID(4) = 74 bytes.
                    + b"\x00" * 74)
    moov = box(b"moov", box(b"mvhd", mvhd_payload))
    mdat = box(b"mdat", b"")
    return ftyp + moov + mdat


def parse_mp4_meta(payload: bytes) -> tuple[int, int, int]:
    """Walk the top-level ISO-BMFF boxes, find moov/mvhd, return
    (timescale, duration, duration_ms) — the container-header read a
    video pipeline does before ever touching a codec."""
    def walk(data: bytes, want: bytes):
        off = 0
        while off + 8 <= len(data):
            size, typ = struct.unpack(">I4s", data[off:off + 8])
            if size < 8:
                raise ValueError("corrupt box size")
            if typ == want:
                return data[off + 8:off + size]
            off += size
        raise ValueError(f"box {want!r} not found")

    if parse_box_type(payload) != b"ftyp":
        raise ValueError("not an MP4 (no leading ftyp)")
    moov = walk(payload, b"moov")
    mvhd = walk(moov, b"mvhd")
    timescale, duration = struct.unpack(">II", mvhd[12:20])
    return timescale, duration, duration * 1000 // timescale


def parse_box_type(payload: bytes) -> bytes:
    return payload[4:8] if len(payload) >= 8 else b""


@register("multimodal_video_meta", oracle="""
SELECT doc_id,
       CAST(600 + (doc_id % 3) * 300 AS BIGINT) AS timescale,
       CAST((n_chars % 500 + 50) * 30 AS BIGINT) AS duration_ticks,
       CAST(((n_chars % 500 + 50) * 30 * 1000)
            // (600 + (doc_id % 3) * 300) AS BIGINT) AS duration_ms,
       CAST(148 AS BIGINT) AS n_bytes
FROM documents
WHERE doc_id % 4 = 0
""", tags=("multimodal", "video"))
def multimodal_video_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video-metadata extraction round trip, fully decoded: synthesize
    one REAL minimal MP4 per (sampled) document — ISO-BMFF ftyp/moov/
    mvhd/mdat boxes with timescale and duration derived from (doc_id,
    n_chars) — then walk the box tree back in a second Arrow stage.
    With make_png/make_bmp (image) and make_wav (audio) this completes
    the multimodal column triple with real header codecs and zero
    stubs; the oracle recomputes timescale/duration/bytes in closed
    form."""

    def synth(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            doc_ids = pdf["doc_id"].astype("int64")
            ts = 600 + (doc_ids % 3) * 300
            dur = (pdf["n_chars"].astype("int64") % 500 + 50) * 30
            payloads = [make_mp4(int(t), int(d))
                        for t, d in zip(ts, dur)]
            yield pd.DataFrame({"doc_id": doc_ids, "payload": payloads})

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            metas = [parse_mp4_meta(p) for p in pdf["payload"]]
            yield pd.DataFrame({
                "doc_id": pdf["doc_id"].astype("int64"),
                "timescale": pd.Series([m[0] for m in metas], dtype="int64"),
                "duration_ticks": pd.Series([m[1] for m in metas],
                                            dtype="int64"),
                "duration_ms": pd.Series([m[2] for m in metas],
                                         dtype="int64"),
                "n_bytes": pdf["payload"].map(len).astype("int64"),
            })

    d = (load_table(spark, sf_dir, "documents")
         .filter(F.col("doc_id") % 4 == 0).select("doc_id", "n_chars"))
    vids = d.mapInPandas(synth, "doc_id long, payload binary")
    return vids.mapInPandas(
        extract, "doc_id long, timescale long, duration_ticks long, "
                 "duration_ms long, n_bytes long")


@register("multimodal_audio_decode", oracle="""
WITH t AS (
  SELECT doc_id, (n_chars % 100 + 10) * 16 AS n FROM documents
), s AS (
  SELECT doc_id, n, ((i * 257) % 32768 - 16384) AS v
  FROM t, unnest(range(0, n)) AS u(i)
)
SELECT doc_id,
       CAST(n AS BIGINT) AS n_samples,
       CAST(MAX(ABS(v)) AS BIGINT) AS peak,
       CAST(SUM(ABS(v)) AS BIGINT) AS sum_abs,
       ROUND(SQRT(CAST(SUM(v * v) AS DOUBLE) / n), 4) AS rms
FROM s
GROUP BY doc_id, n
""", tags=("multimodal", "audio"))
def multimodal_audio_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL audio sample decode — not a header parse and not a stub:
    synthesize one PCM16 WAV per document (multimodal_audio_meta's
    sawtooth payloads), then decode the raw samples with
    ``np.frombuffer`` in a second Arrow stage and emit signal features
    (peak, mean absolute amplitude, RMS). PCM needs no codec library,
    so this exercises the full binary-column contract end-to-end:
    bytes → vectorized numpy kernel → typed features. The oracle
    regenerates the identical sawtooth per doc via a range() unnest and
    aggregates the same integer sums, so peak/sum_abs are exact and
    RMS is a deterministic double from identical integer operands.

    Scale posture: same as every multimodal stage — payloads stay
    inside Arrow batches end to end; the decode is one frombuffer +
    three vector reductions per batch, no per-sample Python. Swapping
    the synth stage for a binaryFile/parquet scan of real shards
    changes nothing downstream; compressed codecs (mp3/flac) slot into
    the same kernel behind the documented library gate."""
    import numpy as np

    def synth(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            doc_ids = pdf["doc_id"].astype("int64")
            rates = 8000 + (doc_ids % 4) * 4000
            counts = (pdf["n_chars"].astype("int64") % 100 + 10) * 16
            payloads = [make_wav(int(r), int(n))
                        for r, n in zip(rates, counts)]
            yield pd.DataFrame({"doc_id": doc_ids, "payload": payloads})

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                samples = np.frombuffer(payload[44:], dtype="<i2")
                a = np.abs(samples.astype(np.int64))
                rows.append((int(doc_id), samples.size, int(a.max()),
                             int(a.sum()),
                             round(float(np.sqrt((a * a).sum() / samples.size)), 4)))
            yield pd.DataFrame(rows, columns=["doc_id", "n_samples",
                                              "peak", "sum_abs", "rms"])

    d = load_table(spark, sf_dir, "documents").select("doc_id", "n_chars")
    wavs = d.mapInPandas(synth, "doc_id long, payload binary")
    return wavs.mapInPandas(
        decode, "doc_id long, n_samples long, peak long, sum_abs long, "
                "rms double")


@register("multimodal_image_decode", oracle="""
SELECT doc_id,
       CAST((n_chars % 64) + 8 AS BIGINT) AS width,
       CAST((doc_id % 32) + 8 AS BIGINT) AS height,
       CAST(((n_chars % 64) + 8) * ((doc_id % 32) + 8) AS BIGINT)
         AS n_pixels,
       CAST((doc_id % 251) * 3 * ((n_chars % 64) + 8) * ((doc_id % 32) + 8)
            AS BIGINT) AS sum_subpixels,
       ROUND(CAST(doc_id % 251 AS DOUBLE), 4) AS mean_subpixel
FROM documents
""", tags=("multimodal", "image"))
def multimodal_image_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL pixel decode — the step beyond multimodal_image_meta's
    header parse: synthesize a 24bpp BMP per document with a
    doc-derived fill byte, then decode the pixel array with numpy —
    including the part codec-free decoding actually gets wrong in the
    wild, stripping each row's 4-byte alignment padding — and emit
    pixel statistics. The oracle recomputes the exact sums in closed
    form from the source columns, so a padding byte leaking into the
    statistics fails the hash.

    Scale posture: identical to the audio decode — payloads stay in
    Arrow batches, the kernel is one frombuffer + reshape + slice +
    sum per image, and swapping synth for a real binaryFile scan of
    image shards changes nothing downstream (PNG/JPEG decode plugs in
    behind the documented library gate)."""
    import numpy as np

    def synth(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            doc_ids = pdf["doc_id"].astype("int64")
            ws = (pdf["n_chars"].astype("int64") % 64) + 8
            hs = (doc_ids % 32) + 8
            payloads = [make_bmp(int(w), int(h), fill=int(i) % 251)
                        for w, h, i in zip(ws, hs, doc_ids)]
            yield pd.DataFrame({"doc_id": doc_ids, "payload": payloads})

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                w, h = struct.unpack("<ii", payload[18:26])
                h = abs(h)
                rowsize = (3 * w + 3) // 4 * 4
                arr = (np.frombuffer(payload[54:], dtype=np.uint8)
                       .reshape(h, rowsize)[:, :3 * w])   # strip pad bytes
                total = int(arr.astype(np.int64).sum())
                rows.append((int(doc_id), w, h, w * h, total,
                             round(total / (3 * w * h), 4)))
            yield pd.DataFrame(rows, columns=[
                "doc_id", "width", "height", "n_pixels",
                "sum_subpixels", "mean_subpixel"])

    d = load_table(spark, sf_dir, "documents").select("doc_id", "n_chars")
    bmps = d.mapInPandas(synth, "doc_id long, payload binary")
    return bmps.mapInPandas(
        decode, "doc_id long, width long, height long, n_pixels long, "
                "sum_subpixels long, mean_subpixel double")


@register("multimodal_image_resize", oracle="""
SELECT doc_id,
       CAST((n_chars % 32) + 4 AS BIGINT) AS out_w,
       CAST((doc_id % 16) + 4 AS BIGINT) AS out_h,
       CAST(127 * 3 * ((n_chars % 32) + 4) * ((doc_id % 16) + 4) AS BIGINT)
         AS sum_resized,
       CAST(127.0 AS DOUBLE) AS mean_resized
FROM documents
""", tags=("multimodal", "image", "resize"))
def multimodal_image_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL 2x box-downsample (average pooling) over decoded BMP
    pixels — the resize step of an image-training pipeline, after
    multimodal_image_decode's raw decode. Each document synthesizes a
    checkerboard BMP (alternating 0/255 subpixels) at even dims
    (2*out_w x 2*out_h), the kernel strips BMP row padding, reshapes
    into 2x2x3 blocks and integer-averages them.

    The checkerboard makes the oracle closed-form AND misalignment-
    sensitive: every correctly aligned 2x2 block averages to exactly
    127 (floor of 127.5), so the resized sum is 127*3*out_w*out_h —
    but any off-by-one in padding-strip or row pairing pairs equal
    parities and yields 0/255 blocks, breaking the hash.

    Scale posture: same as the decode queries — payloads never leave
    Arrow batches, the kernel is vectorized numpy per image, and a
    real scan + PIL/cv2 resize drops into the same mapInPandas shape
    unchanged."""
    import numpy as np

    def synth(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            doc_ids = pdf["doc_id"].astype("int64")
            out = []
            for doc_id, n_chars in zip(doc_ids, pdf["n_chars"].astype("int64")):
                w = 2 * ((int(n_chars) % 32) + 4)
                h = 2 * ((int(doc_id) % 16) + 4)
                rowsize = (3 * w + 3) // 4 * 4
                # checkerboard pixels, bottom-up rows like a real BMP
                rows_px = np.zeros((h, rowsize), dtype=np.uint8)
                rr, cc = np.meshgrid(np.arange(h), np.arange(3 * w),
                                     indexing="ij")
                rows_px[:, :3 * w] = np.where((rr + cc // 3) % 2 == 1, 255, 0)
                header = (b"BM" + struct.pack("<IHHI", 54 + h * rowsize,
                                              0, 0, 54)
                          + struct.pack("<iiiHHIIiiII", 40, w, h, 1, 24, 0,
                                        h * rowsize, 2835, 2835, 0, 0))
                out.append((int(doc_id), header + rows_px.tobytes()))
            yield pd.DataFrame(out, columns=["doc_id", "payload"])

    def resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                w, h = struct.unpack("<ii", payload[18:26])
                h = abs(h)
                rowsize = (3 * w + 3) // 4 * 4
                px = (np.frombuffer(payload[54:], dtype=np.uint8)
                      .reshape(h, rowsize)[:, :3 * w]
                      .reshape(h, w, 3).astype(np.int64))
                # 2x2 box average, integer floor — (h//2, w//2, 3)
                small = (px[0::2, 0::2] + px[1::2, 0::2]
                         + px[0::2, 1::2] + px[1::2, 1::2]) // 4
                rows.append((int(doc_id), w // 2, h // 2,
                             int(small.sum()),
                             round(float(small.mean()), 4)))
            yield pd.DataFrame(rows, columns=[
                "doc_id", "out_w", "out_h", "sum_resized", "mean_resized"])

    d = load_table(spark, sf_dir, "documents").select("doc_id", "n_chars")
    bmps = d.mapInPandas(synth, "doc_id long, payload binary")
    return bmps.mapInPandas(
        resize, "doc_id long, out_w long, out_h long, sum_resized long, "
                "mean_resized double")


@register("multimodal_frame_sample", oracle="""
WITH frames AS (
  SELECT doc_id,
         CAST((n_chars % 40) + 10 AS BIGINT) AS n_frames,
         unnest(range(0, (n_chars % 40) + 10, 5)) AS f
  FROM documents
)
SELECT doc_id,
       n_frames,
       CAST(COUNT(*) AS BIGINT) AS n_sampled,
       CAST(SUM((doc_id + f) % 251) AS BIGINT) AS sum_fill
FROM frames GROUP BY doc_id, n_frames
""", tags=("multimodal", "video", "sampling"))
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame sampling over a video-like binary column — the standard
    stride-k frame extraction a vision-training pipeline runs before
    per-frame featurization. Each document synthesizes a toy container
    (u32 frame count + raw 8x8 grayscale frames whose fill encodes
    (doc_id + frame_idx) % 251), the sampler decodes the header, takes
    every 5th frame WITHOUT materializing the rest, and emits per-doc
    frame statistics.

    The oracle rebuilds the same sampled-frame sum relationally
    (DuckDB range() with stride), so a stride bug, off-by-one in the
    frame offsets, or a header misparse all break the hash. A real
    mp4 pipeline swaps the toy container for ffmpeg-seek behind the
    same mapInPandas signature — the point here is the Spark-side
    shape: binary in Arrow batches, per-frame fan-out bounded by the
    stride, schema stable."""
    import numpy as np

    FRAME_W = FRAME_H = 8
    STRIDE = 5

    def synth(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for doc_id, n_chars in zip(pdf["doc_id"].astype("int64"),
                                       pdf["n_chars"].astype("int64")):
                n_frames = (int(n_chars) % 40) + 10
                frames = np.stack([
                    np.full((FRAME_H, FRAME_W),
                            (int(doc_id) + f) % 251, dtype=np.uint8)
                    for f in range(n_frames)])
                payload = struct.pack("<I", n_frames) + frames.tobytes()
                out.append((int(doc_id), payload))
            yield pd.DataFrame(out, columns=["doc_id", "payload"])

    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        fsize = FRAME_W * FRAME_H
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                n_frames = struct.unpack("<I", payload[:4])[0]
                sum_fill = 0
                n_sampled = 0
                for f in range(0, n_frames, STRIDE):
                    frame = np.frombuffer(
                        payload[4 + f * fsize:4 + (f + 1) * fsize],
                        dtype=np.uint8)
                    # constant-fill frame: any pixel is the fill value
                    sum_fill += int(frame[0])
                    n_sampled += 1
                rows.append((int(doc_id), int(n_frames), n_sampled, sum_fill))
            yield pd.DataFrame(rows, columns=[
                "doc_id", "n_frames", "n_sampled", "sum_fill"])

    d = load_table(spark, sf_dir, "documents").select("doc_id", "n_chars")
    vids = d.mapInPandas(synth, "doc_id long, payload binary")
    return vids.mapInPandas(
        sample, "doc_id long, n_frames long, n_sampled long, sum_fill long")
