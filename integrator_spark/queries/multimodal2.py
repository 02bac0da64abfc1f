"""Image near-dup dedup — the perceptual-hash analog of the text
MinHash family (VERDICT r11 item 1: the one operator the multimodal +
Hamming families built every part of but never connected).

Pipeline: synthesize one REAL 32x32 24bpp BMP per document (pattern
painted from doc columns so near-duplicates exist BY CONSTRUCTION),
decode pixels, 4x4 box-downsample to the 8x8 dHash grid, compare
horizontal neighbors into a 56-bit difference hash, then Hamming-radius
dedup through the multi-index (MIH) inverted-chunk join — EXACT by
pigeonhole, which is what keeps every face oracle-expressible: DuckDB
recomputes the 56-bit code in closed form from the source columns and
brute-force self-joins on bit_count(xor) <= radius, and exactness means
the indexed Spark plan must produce the identical pair set.

Fixture geometry (chosen numerically, see tests): 37 pattern groups,
base patterns separated by >= 19 bits; each doc flips doc_id % 3 bits
(positions (doc_id // 37 + 13*j) % 56) — intra-group distance <= 4,
inter-group >= 15, so radius 6 yields exactly the intra-group pairs
with zero false positives at every sf.

Scale posture: both image stages are mapInPandas over Arrow batches
(payloads never leave the executor, a real JPEG decoder drops into the
dhash kernel behind the documented gate); the dedup is the chunk-keyed
MIH join — bucket-collision cost, never corpus^2. dHash is 64 bits/img
regardless of image size, so the dedup side of a 100 TB image corpus
is a few GB of codes.
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io import load_table
from ..registry import register

_GROUPS = 37          # pattern groups (near-dup families)
_DHASH_BITS = 56      # 8 rows x 7 horizontal diffs
_RADIUS = 6           # dedup Hamming radius
_N_CHUNKS = _RADIUS + 1   # pigeonhole: r flips can't touch all r+1
_CHUNK_BITS = 8           # 7 x 8 = 56 bits
_CELL = 4             # pixels per dHash grid cell (image is 32x32)


def _pattern_bits(doc_id: int, n_bits: int = _DHASH_BITS) -> int:
    """The n_bits pattern a document's image encodes: group base
    (quadratic mixing mod 83 — min inter-group Hamming 19 at 56 bits
    / 91 at 256 bits across all 37 groups, verified in tests) XOR
    doc-specific flips (doc_id % 3 bits). The DuckDB oracles
    recompute this same closed form."""
    g = doc_id % _GROUPS
    code = 0
    for k in range(n_bits):
        bit = ((g + 5) * (k + 11) * (k + 3)
               + (g + 11) * (g + 3) * (k + 5)) % 83 < 41
        flipped = ((doc_id % 3 >= 1
                    and k == (doc_id // _GROUPS) % n_bits)
                   or (doc_id % 3 >= 2
                       and k == (doc_id // _GROUPS + 13) % n_bits))
        if bit != flipped:
            code |= 1 << k
    return code


def _bmp_from_pattern(pattern: int, rows: int = 8, cols: int = 8,
                      cell: int = _CELL) -> bytes:
    """Paint a pattern as a REAL bottom-up 24bpp BMP: a rows x cols
    brightness grid (each cell a cell x cell pixel block, all three
    channels equal) whose horizontal walk encodes the bits — cell
    (r, 0) is 120 and each step goes DOWN 4 when bit r*(cols-1)+c is
    set, UP 4 when clear, so dHash's left>right comparison recovers
    exactly the bit. Values stay within [120 - 4*(cols-1),
    120 + 4*(cols-1)] — uint8-safe up to cols = 17."""
    v = np.empty((rows, cols), dtype=np.int64)
    v[:, 0] = 120
    for r in range(rows):
        for c in range(cols - 1):
            bit = (pattern >> (r * (cols - 1) + c)) & 1
            v[r, c + 1] = v[r, c] - 4 if bit else v[r, c] + 4
    gray = np.kron(v, np.ones((cell, cell), dtype=np.int64))
    px = np.repeat(gray[:, :, None], 3, axis=2).astype(np.uint8)
    h, w = rows * cell, cols * cell
    rowsize = (3 * w + 3) // 4 * 4
    row_px = np.zeros((h, rowsize), dtype=np.uint8)
    row_px[:, :3 * w] = px.reshape(h, 3 * w)
    payload = row_px[::-1].tobytes()   # bottom-up rows, like a real BMP
    header = (b"BM" + struct.pack("<IHHI", 54 + len(payload), 0, 0, 54)
              + struct.pack("<iiiHHIIiiII", 40, w, h, 1, 24, 0,
                            len(payload), 2835, 2835, 0, 0))
    return header + payload


def _dib_dhash(data: bytes, w: int, h: int, cell: int) -> int:
    """dHash over RAW bottom-up 24bpp DIB pixel rows (what a BMP file
    carries after its 54-byte header, and what an AVI '00db' frame
    chunk carries with NO header at all — the video face reuses this
    kernel verbatim): strip row padding, un-flip the bottom-up rows,
    grayscale (channel mean — exact here since the channels are
    equal), cell x cell box-average down to the grid, then bit
    r*(gw-1)+c = grid[r,c] > grid[r,c+1], packed little-endian into an
    int (arbitrary width — the caller chooses word packing)."""
    rowsize = (3 * w + 3) // 4 * 4
    px = (np.frombuffer(data, dtype=np.uint8)
          .reshape(h, rowsize)[:, :3 * w])[::-1]   # bottom-up -> top-down
    gray = px.reshape(h, w, 3).mean(axis=2)
    gh, gw = h // cell, w // cell
    grid = gray.reshape(gh, cell, gw, cell).mean(axis=(1, 3))
    code = 0
    for r in range(gh):
        for c in range(gw - 1):
            if grid[r, c] > grid[r, c + 1]:
                code |= 1 << (r * (gw - 1) + c)
    return code


def _dhash_code(payload: bytes, cell: int = _CELL) -> int:
    """REAL dHash over a decoded BMP: parse width/height off the
    BITMAPINFOHEADER, then run :func:`_dib_dhash` on the pixel rows.
    A JPEG/PNG pixel decoder drops in front of this unchanged — the
    grid/compare/pack step is the whole algorithm."""
    w, h = struct.unpack("<ii", payload[18:26])
    return _dib_dhash(payload[54:], w, abs(h), cell)


def _dhash56(payload: bytes) -> int:
    """The 8x8-grid 56-bit face of :func:`_dhash_code`."""
    return _dhash_code(payload, cell=_CELL)


def _synth_images(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        doc_ids = pdf["doc_id"].astype("int64")
        yield pd.DataFrame({
            "doc_id": doc_ids,
            "payload": [_bmp_from_pattern(_pattern_bits(int(d)))
                        for d in doc_ids]})


def _dhash_images(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        yield pd.DataFrame({
            "doc_id": pdf["doc_id"].astype("int64"),
            "code": pd.Series([_dhash56(p) for p in pdf["payload"]],
                              dtype="int64")})


def image_dhash_codes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents -> (doc_id, 56-bit dHash code): synth stage paints
    the BMPs, dhash stage decodes them back — two Arrow-batched
    mapInPandas stages, embarrassingly parallel. localCheckpoint'd:
    the MIH consumer reads codes THREE times (chunk index + both
    sides of the exact-distance fetch), and without the pin each
    consumer would re-run the paint+decode Python stages — 16 B/image
    of codes is the thing to keep, not the thing to recompute."""
    d = load_table(spark, sf_dir, "documents").select("doc_id")
    bmps = d.mapInPandas(_synth_images, "doc_id long, payload binary")
    return bmps.mapInPandas(_dhash_images,
                            "doc_id long, code long").localCheckpoint(
        eager=False)


#: Closed-form recompute of the dHash code — shared CTE head of every
#: oracle in this module. The bit formula is _pattern_bits verbatim;
#: the != between the base-bit and flipped booleans is the XOR.
_CODES_CTE = """
codes AS (
  SELECT d.doc_id,
         CAST(SUM(CASE WHEN
               (((((d.doc_id % 37) + 5) * (t.k + 11) * (t.k + 3)
                  + ((d.doc_id % 37) + 11) * ((d.doc_id % 37) + 3)
                    * (t.k + 5)) % 83) < 41)
               != (((d.doc_id % 3) >= 1 AND t.k = (d.doc_id // 37) % 56)
                   OR ((d.doc_id % 3) >= 2
                       AND t.k = ((d.doc_id // 37) + 13) % 56))
             THEN (1::BIGINT << t.k) ELSE 0 END) AS BIGINT) AS code
  FROM documents d
  CROSS JOIN (SELECT unnest(range(0, 56)) AS k) t
  GROUP BY d.doc_id)
"""


@register("multimodal_image_dedup", oracle=f"""
WITH {_CODES_CTE}
SELECT a.doc_id, b.doc_id AS dup_id,
       CAST(bit_count(xor(a.code, b.code)) AS INT) AS hamming
FROM codes a JOIN codes b ON a.doc_id < b.doc_id
WHERE bit_count(xor(a.code, b.code)) <= 6
ORDER BY 1, 2
""", tags=("multimodal", "image", "dedup", "neardup"))
def multimodal_image_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Image near-duplicate detection end to end: real BMP synth ->
    real pixel decode -> 56-bit dHash -> MIH Hamming-radius dedup
    (7 x 8-bit chunks, radius 6 — exact by pigeonhole). The oracle
    brute-force self-joins the closed-form codes, so the indexed plan
    must return the IDENTICAL pair set: a wrong padding strip, a
    flipped row order, a mis-packed bit, or an incomplete candidate
    join all fail the hash. Output: (doc_id, dup_id, hamming)."""
    from ..operators.dedup import mih_radius_pairs_codes
    codes = image_dhash_codes(spark, sf_dir)
    pairs = mih_radius_pairs_codes(codes, n_chunks=_N_CHUNKS,
                                   chunk_bits=_CHUNK_BITS,
                                   radius=_RADIUS)
    return (pairs.select(F.col("id_a").alias("doc_id"),
                         F.col("id_b").alias("dup_id"), "hamming")
            .orderBy("doc_id", "dup_id"))


@register("multimodal_image_dedup_incremental", oracle=f"""
WITH {_CODES_CTE}
SELECT n.doc_id AS new_id, c.doc_id AS corpus_id,
       CAST(bit_count(xor(n.code, c.code)) AS INT) AS hamming
FROM codes n JOIN codes c
  ON n.doc_id % 10 >= 8 AND c.doc_id % 10 < 8
WHERE bit_count(xor(n.code, c.code)) <= 6
ORDER BY 1, 2
""", tags=("multimodal", "image", "dedup", "incremental"))
def multimodal_image_dedup_incremental(spark: SparkSession,
                                       sf_dir: str) -> DataFrame:
    """Incremental image-dedup ingest — the dHash companion of
    dedup_minhash_incremental's 80/20 crawl-batch split: each new
    image's chunks probe ONLY the corpus chunk index (batch x corpus
    join; batch-batch and corpus-corpus pairs never form), exact
    popcount on the collisions. MIH exactness keeps the oracle a
    brute batch x corpus join — no index replay needed. Steady-state
    cost tracks the batch; the corpus chunk index is append-only."""
    from ..operators.dedup import mih_radius_pairs_codes
    codes = image_dhash_codes(spark, sf_dir)
    batch_ids = codes.filter(F.col("doc_id") % 10 >= 8) \
        .select("doc_id")
    pairs = mih_radius_pairs_codes(codes, n_chunks=_N_CHUNKS,
                                   chunk_bits=_CHUNK_BITS,
                                   radius=_RADIUS, probe_ids=batch_ids)
    return (pairs.select(F.col("id_a").alias("new_id"),
                         F.col("id_b").alias("corpus_id"), "hamming")
            .orderBy("new_id", "corpus_id"))


#: Production-dial geometry: 16x17 grid (2x2-px cells, 34x32 BMP with
#: 2 real padding bytes/row) -> 256-bit dHash packed as 8 x 32-bit
#: words, radius 7 with 8 word-chunks. 2^32 keyspace per chunk stays
#: selective at billions of images — the dial the 56-bit face can't
#: reach (its 8-bit chunks saturate past ~100k images).
_WIDE_ROWS, _WIDE_COLS, _WIDE_CELL = 16, 17, 2
_WIDE_BITS = _WIDE_ROWS * (_WIDE_COLS - 1)   # 256
_WIDE_WORD_BITS, _WIDE_RADIUS = 32, 7
_WIDE_WORDS = _WIDE_BITS // _WIDE_WORD_BITS  # 8


def _synth_images_wide(batches: Iterator[pd.DataFrame]
                       ) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        doc_ids = pdf["doc_id"].astype("int64")
        yield pd.DataFrame({
            "doc_id": doc_ids,
            "payload": [_bmp_from_pattern(
                _pattern_bits(int(d), n_bits=_WIDE_BITS),
                rows=_WIDE_ROWS, cols=_WIDE_COLS, cell=_WIDE_CELL)
                for d in doc_ids]})


def _dhash_images_wide(batches: Iterator[pd.DataFrame]
                       ) -> Iterator[pd.DataFrame]:
    mask = (1 << _WIDE_WORD_BITS) - 1
    for pdf in batches:
        words = []
        for p in pdf["payload"]:
            code = _dhash_code(p, cell=_WIDE_CELL)
            words.append([(code >> (_WIDE_WORD_BITS * w)) & mask
                          for w in range(_WIDE_WORDS)])
        yield pd.DataFrame({"doc_id": pdf["doc_id"].astype("int64"),
                            "words": words})


@register("multimodal_image_dedup_wide", oracle=f"""
WITH wcodes AS (
  SELECT d.doc_id, t.k // {_WIDE_WORD_BITS} AS w,
         CAST(SUM(CASE WHEN
               (((((d.doc_id % 37) + 5) * (t.k + 11) * (t.k + 3)
                  + ((d.doc_id % 37) + 11) * ((d.doc_id % 37) + 3)
                    * (t.k + 5)) % 83) < 41)
               != (((d.doc_id % 3) >= 1
                    AND t.k = (d.doc_id // 37) % {_WIDE_BITS})
                   OR ((d.doc_id % 3) >= 2
                       AND t.k = ((d.doc_id // 37) + 13) % {_WIDE_BITS}))
             THEN (1::BIGINT << (t.k % {_WIDE_WORD_BITS})) ELSE 0 END)
           AS BIGINT) AS code
  FROM documents d
  CROSS JOIN (SELECT unnest(range(0, {_WIDE_BITS})) AS k) t
  GROUP BY d.doc_id, t.k // {_WIDE_WORD_BITS})
SELECT a.doc_id, b.doc_id AS dup_id,
       CAST(SUM(bit_count(xor(a.code, b.code))) AS INT) AS hamming
FROM wcodes a JOIN wcodes b ON a.w = b.w AND a.doc_id < b.doc_id
GROUP BY 1, 2
HAVING SUM(bit_count(xor(a.code, b.code))) <= {_WIDE_RADIUS}
ORDER BY 1, 2
""", tags=("multimodal", "image", "dedup", "neardup"))
def multimodal_image_dedup_wide(spark: SparkSession,
                                sf_dir: str) -> DataFrame:
    """The PRODUCTION DIAL of image near-dup dedup: a 256-bit dHash
    (16x17 grid over 2x2-px cells — more grid, finer structure) packed
    as 8 x 32-bit words, each word its own exact-match MIH chunk,
    radius 7. This is the dial that survives 100 TB: the 56-bit face's
    8-bit chunks hold a 256-key space each (buckets saturate past
    ~100k images, candidates go quadratic), while 32-bit chunks give a
    4-billion-key space per chunk — bucket collisions track TRUE
    near-dups at any realistic corpus, exactly the inversion
    mih_adaptive_dial documents for the embedding family. Exact by
    pigeonhole at radius <= 7; same closed-form oracle discipline as
    the 56-bit face (brute word-join popcount sum in DuckDB), and the
    BMPs are real — 2 padding bytes per row this time, so a padding
    bug that the 96-byte-aligned 56-bit fixture can't see fails here.
    """
    from ..operators.dedup import mih_radius_pairs_codes_wide
    d = load_table(spark, sf_dir, "documents").select("doc_id")
    bmps = d.mapInPandas(_synth_images_wide,
                         "doc_id long, payload binary")
    # same three-consumer pin as image_dhash_codes: keep the 64 B of
    # words per image, never re-run the paint+decode Python stages
    codes = bmps.mapInPandas(
        _dhash_images_wide,
        "doc_id long, words array<long>").localCheckpoint(eager=False)
    pairs = mih_radius_pairs_codes_wide(codes, radius=_WIDE_RADIUS)
    return (pairs.select(F.col("id_a").alias("doc_id"),
                         F.col("id_b").alias("dup_id"), "hamming")
            .orderBy("doc_id", "dup_id"))


#: Audio-fingerprint geometry: 57 blocks of 32 PCM16 samples each; a
#: ±400 amplitude walk across block means encodes the same 56-bit
#: pattern family as the image face (values stay within ±22,400 —
#: int16-safe for 56 steps), so the dedup side reuses the identical
#: MIH dial and the identical closed-form oracle codes.
_AUDIO_BLOCKS, _AUDIO_BLOCK_SAMPLES, _AUDIO_STEP = 57, 32, 400


def _wav_from_pattern(pattern: int) -> bytes:
    """Paint a pattern as a REAL RIFF/WAVE PCM16 mono file: 57 blocks
    of 32 constant samples whose level walk encodes the bits — block
    0 at level 0, each step goes DOWN _AUDIO_STEP when bit i is set,
    UP when clear, so the fingerprint's left>right mean comparison
    recovers exactly the bit."""
    levels = np.empty(_AUDIO_BLOCKS, dtype=np.int64)
    levels[0] = 0
    for i in range(_AUDIO_BLOCKS - 1):
        bit = (pattern >> i) & 1
        levels[i + 1] = levels[i] - _AUDIO_STEP if bit \
            else levels[i] + _AUDIO_STEP
    samples = np.repeat(levels, _AUDIO_BLOCK_SAMPLES).astype("<i2")
    data = samples.tobytes()
    rate = 8000
    return (b"RIFF" + struct.pack("<I", 36 + len(data)) + b"WAVE"
            + b"fmt " + struct.pack("<IHHIIHH", 16, 1, 1, rate,
                                    rate * 2, 2, 16)
            + b"data" + struct.pack("<I", len(data)) + data)


def _audio_fingerprint56(payload: bytes) -> int:
    """REAL audio fingerprint over a decoded WAV: parse the RIFF/fmt
    header, frombuffer the PCM16 samples, block-mean the envelope
    (57 blocks), bit i = mean[i] > mean[i+1] — the
    amplitude-envelope difference hash (the dHash idea on the time
    axis; a real pipeline swaps block means for log-mel bands behind
    the same signature). 56 bits regardless of duration."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a WAV")
    data_len = struct.unpack("<I", payload[40:44])[0]
    pcm = np.frombuffer(payload[44:44 + data_len], dtype="<i2")
    blocks = pcm.reshape(_AUDIO_BLOCKS, -1).mean(axis=1)
    code = 0
    for i in range(_AUDIO_BLOCKS - 1):
        if blocks[i] > blocks[i + 1]:
            code |= 1 << i
    return code


def _synth_audio(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        doc_ids = pdf["doc_id"].astype("int64")
        yield pd.DataFrame({
            "doc_id": doc_ids,
            "payload": [_wav_from_pattern(_pattern_bits(int(d)))
                        for d in doc_ids]})


def _fingerprint_audio(batches: Iterator[pd.DataFrame]
                       ) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        yield pd.DataFrame({
            "doc_id": pdf["doc_id"].astype("int64"),
            "code": pd.Series([_audio_fingerprint56(p)
                               for p in pdf["payload"]],
                              dtype="int64")})


@register("multimodal_audio_dedup", oracle=f"""
WITH {_CODES_CTE}
SELECT a.doc_id, b.doc_id AS dup_id,
       CAST(bit_count(xor(a.code, b.code)) AS INT) AS hamming
FROM codes a JOIN codes b ON a.doc_id < b.doc_id
WHERE bit_count(xor(a.code, b.code)) <= 6
ORDER BY 1, 2
""", tags=("multimodal", "audio", "dedup", "neardup"))
def multimodal_audio_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AUDIO near-duplicate detection — the third modality of the
    dedup matrix (text MinHash, image dHash, audio envelope hash, all
    feeding the same MIH radius operator): real WAV synth → real
    RIFF/PCM16 decode → 57-block amplitude-envelope difference hash
    (56 bits) → Hamming-radius-6 MIH dedup. The fingerprint encodes
    the SAME pattern family as the image face, so the closed-form
    oracle codes are shared — what this face proves is the AUDIO
    path: header walk, sample decode, block-mean envelope, bit pack.
    A production pipeline swaps block means for log-mel bands behind
    the identical signature contract."""
    from ..operators.dedup import mih_radius_pairs_codes
    d = load_table(spark, sf_dir, "documents").select("doc_id")
    wavs = d.mapInPandas(_synth_audio, "doc_id long, payload binary")
    codes = wavs.mapInPandas(
        _fingerprint_audio, "doc_id long, code long").localCheckpoint(
        eager=False)
    pairs = mih_radius_pairs_codes(codes, n_chunks=_N_CHUNKS,
                                   chunk_bits=_CHUNK_BITS,
                                   radius=_RADIUS)
    return (pairs.select(F.col("id_a").alias("doc_id"),
                         F.col("id_b").alias("dup_id"), "hamming")
            .orderBy("doc_id", "dup_id"))


@register("multimodal_image_dedup_deletes", oracle=f"""
WITH {_CODES_CTE}
SELECT a.doc_id, b.doc_id AS dup_id,
       CAST(bit_count(xor(a.code, b.code)) AS INT) AS hamming
FROM codes a JOIN codes b ON a.doc_id < b.doc_id
WHERE a.doc_id % 9 <> 4 AND b.doc_id % 9 <> 4
  AND bit_count(xor(a.code, b.code)) <= 6
ORDER BY 1, 2
""", tags=("multimodal", "image", "dedup", "deletes"))
def multimodal_image_dedup_deletes(spark: SparkSession,
                                   sf_dir: str) -> DataFrame:
    """Image dedup over a corpus with a DELETE SET — the image-family
    face of the tombstone story (vec_hamming_serve_deletes proves the
    append-only-index invariant on the vector side; here the point is
    the read-side rule): deletes live in a small tombstone frame
    (what a deletes table holds — data, not a predicate baked into
    the pipeline) broadcast-anti-joined against the code store before
    the chunk join, so deleted images neither pair nor are paired.
    Tombstone rule doc_id % 9 == 4 (static, so DuckDB replays it as a
    WHERE clause); MIH exactness keeps the oracle a brute filtered
    self-join."""
    from ..operators.dedup import mih_radius_pairs_codes
    codes = image_dhash_codes(spark, sf_dir)
    tomb = (codes.filter(F.col("doc_id") % 9 == 4)
            .select("doc_id"))
    live = codes.join(F.broadcast(tomb), "doc_id", "left_anti")
    pairs = mih_radius_pairs_codes(live, n_chunks=_N_CHUNKS,
                                   chunk_bits=_CHUNK_BITS,
                                   radius=_RADIUS)
    return (pairs.select(F.col("id_a").alias("doc_id"),
                         F.col("id_b").alias("dup_id"), "hamming")
            .orderBy("doc_id", "dup_id"))


def _multimodal_curation_oracle() -> str:
    from .dedup import _MINHASH_DET_CTE_TMPL
    return ("WITH " + _MINHASH_DET_CTE_TMPL.replace("{GUARD}", "")
            + "," + _CODES_CTE + """,
tpairs AS (SELECT c.d1, c.d2,
                  SUM(CASE WHEN x.mh = y.mh THEN 1 ELSE 0 END) AS n_equal
           FROM cand c
           JOIN mh x ON x.doc_id = c.d1
           JOIN mh y ON y.doc_id = c.d2 AND y.i = x.i
           GROUP BY 1, 2),
tl AS (SELECT DISTINCT d2 AS doc_id FROM tpairs WHERE n_equal >= 8),
il AS (SELECT DISTINCT b.doc_id
       FROM codes a JOIN codes b ON a.doc_id < b.doc_id
       WHERE bit_count(xor(a.code, b.code)) <= 6)
SELECT d.lang,
       COUNT(*) AS n_total,
       CAST(SUM(CASE WHEN tl.doc_id IS NOT NULL THEN 1 ELSE 0 END)
            AS BIGINT) AS n_text_dupes,
       CAST(SUM(CASE WHEN il.doc_id IS NOT NULL THEN 1 ELSE 0 END)
            AS BIGINT) AS n_image_dupes,
       CAST(SUM(CASE WHEN tl.doc_id IS NULL AND il.doc_id IS NULL
                THEN 1 ELSE 0 END) AS BIGINT) AS n_survivors
FROM documents d
LEFT JOIN tl ON tl.doc_id = d.doc_id
LEFT JOIN il ON il.doc_id = d.doc_id
GROUP BY 1
ORDER BY 1
""")


def _modality_conflict_oracle() -> str:
    from .dedup import _MINHASH_DET_CTE_TMPL
    return ("WITH " + _MINHASH_DET_CTE_TMPL.replace("{GUARD}", "")
            + "," + _CODES_CTE + """,
tpairs AS (SELECT c.d1, c.d2,
                  SUM(CASE WHEN x.mh = y.mh THEN 1 ELSE 0 END) AS n_equal
           FROM cand c
           JOIN mh x ON x.doc_id = c.d1
           JOIN mh y ON y.doc_id = c.d2 AND y.i = x.i
           GROUP BY 1, 2),
tdup AS (SELECT DISTINCT doc_id FROM (
           SELECT d1 AS doc_id FROM tpairs WHERE n_equal >= 8
           UNION ALL
           SELECT d2 FROM tpairs WHERE n_equal >= 8)),
idup AS (SELECT DISTINCT doc_id FROM (
           SELECT a.doc_id FROM codes a JOIN codes b
             ON a.doc_id < b.doc_id
           WHERE bit_count(xor(a.code, b.code)) <= 6
           UNION ALL
           SELECT b.doc_id FROM codes a JOIN codes b
             ON a.doc_id < b.doc_id
           WHERE bit_count(xor(a.code, b.code)) <= 6))
SELECT d.lang,
       CASE WHEN t.doc_id IS NOT NULL AND i.doc_id IS NOT NULL
            THEN 'both'
            WHEN t.doc_id IS NOT NULL THEN 'text_only'
            WHEN i.doc_id IS NOT NULL THEN 'image_only'
            ELSE 'neither' END AS dup_modality,
       COUNT(*) AS n_docs,
       CAST(MIN(d.doc_id) AS BIGINT) AS min_doc_id
FROM documents d
LEFT JOIN tdup t ON t.doc_id = d.doc_id
LEFT JOIN idup i ON i.doc_id = d.doc_id
GROUP BY 1, 2
ORDER BY 1, 2
""")


@register("multimodal_modality_conflict",
          oracle=_modality_conflict_oracle(),
          tags=("multimodal", "dedup", "analysis"))
def multimodal_modality_conflict(spark: SparkSession,
                                 sf_dir: str) -> DataFrame:
    """Cross-modal AGREEMENT analysis — the report a curation owner
    reads before trusting either dedup signal: classify every doc by
    which modalities flag it as duplicated (text MinHash >= 0.5 /
    image dHash <= 6, membership in ANY pair — symmetric, unlike the
    curation face's keep-first losers). 'image_only' docs are the
    caption-variant problem (near-identical images, different text) a
    text-only pipeline ships as duplicates; 'text_only' the
    boilerplate problem an image-only pipeline misses. Output:
    (lang, dup_modality, n_docs, min_doc_id) — the min id gives the
    auditor a concrete example per bucket. Both pair sets are the
    registered operators' own plans; DuckDB replays both chains."""
    from ..operators.dedup import mih_radius_pairs_codes, minhash_det_pairs
    d = load_table(spark, sf_dir, "documents")
    tp = (minhash_det_pairs(d, k=3, n_hashes=16, n_bands=4)
          .filter(F.col("n_equal") >= 8))
    tdup = (tp.select(F.col("d1").alias("doc_id"))
            .unionByName(tp.select(F.col("d2").alias("doc_id")))
            .distinct().withColumn("_t", F.lit(1)))
    ip = mih_radius_pairs_codes(image_dhash_codes(spark, sf_dir),
                                n_chunks=_N_CHUNKS,
                                chunk_bits=_CHUNK_BITS, radius=_RADIUS)
    idup = (ip.select(F.col("id_a").alias("doc_id"))
            .unionByName(ip.select(F.col("id_b").alias("doc_id")))
            .distinct().withColumn("_i", F.lit(1)))
    bucket = (F.when(F.col("_t").isNotNull() & F.col("_i").isNotNull(),
                     "both")
              .when(F.col("_t").isNotNull(), "text_only")
              .when(F.col("_i").isNotNull(), "image_only")
              .otherwise("neither"))
    return (d.select("doc_id", "lang")
            .join(F.broadcast(tdup), "doc_id", "left")
            .join(F.broadcast(idup), "doc_id", "left")
            .withColumn("dup_modality", bucket)
            .groupBy("lang", "dup_modality")
            .agg(F.count(F.lit(1)).alias("n_docs"),
                 F.min("doc_id").cast("long").alias("min_doc_id"))
            .orderBy("lang", "dup_modality"))


@register("pipeline_multimodal_curation",
          oracle=_multimodal_curation_oracle(),
          tags=("multimodal", "dedup", "pipeline", "mlprep"))
def pipeline_multimodal_curation(spark: SparkSession,
                                 sf_dir: str) -> DataFrame:
    """CROSS-MODAL survivorship (VERDICT r11 item 2): a document
    survives only if NEITHER its text MinHash (est_jaccard >= 0.5,
    i.e. >= 8 of 16 components equal) NOR its image dHash (Hamming
    <= 6) matched an earlier keeper — keep-first under doc_id order,
    each modality running its own registered dedup operator
    (minhash_det_pairs, mih_radius_pairs_codes), losers unioned
    before one anti-join. The report is the curation funnel per lang:
    total -> per-modality duplicate counts -> survivors. The oracle
    replays BOTH modalities end to end (shingles, affine MinHash,
    banded candidates, component residual; closed-form dHash codes,
    brute radius join) — a drift in either pipeline fails the hash."""
    from ..operators.dedup import mih_radius_pairs_codes, minhash_det_pairs
    d = load_table(spark, sf_dir, "documents")
    text_losers = (minhash_det_pairs(d, k=3, n_hashes=16, n_bands=4)
                   .filter(F.col("n_equal") >= 8)
                   .select(F.col("d2").alias("doc_id")).distinct()
                   .withColumn("_t", F.lit(1)))
    codes = image_dhash_codes(spark, sf_dir)
    img_losers = (mih_radius_pairs_codes(codes, n_chunks=_N_CHUNKS,
                                         chunk_bits=_CHUNK_BITS,
                                         radius=_RADIUS)
                  .select(F.col("id_b").alias("doc_id")).distinct()
                  .withColumn("_i", F.lit(1)))
    flagged = (d.select("doc_id", "lang")
               .join(F.broadcast(text_losers), "doc_id", "left")
               .join(F.broadcast(img_losers), "doc_id", "left"))
    return (flagged.groupBy("lang")
            .agg(F.count(F.lit(1)).alias("n_total"),
                 F.sum(F.when(F.col("_t").isNotNull(), 1).otherwise(0))
                  .cast("long").alias("n_text_dupes"),
                 F.sum(F.when(F.col("_i").isNotNull(), 1).otherwise(0))
                  .cast("long").alias("n_image_dupes"),
                 F.sum(F.when(F.col("_t").isNull()
                              & F.col("_i").isNull(), 1).otherwise(0))
                  .cast("long").alias("n_survivors"))
            .orderBy("lang"))
