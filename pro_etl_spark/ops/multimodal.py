"""Multimodal column plumbing (BASELINE.json north-star): image/audio/
video payloads as opaque ``binary`` columns with typed metadata,
decode/feature-extract as Arrow-batched ``mapInPandas`` stages.

Decode attempts the REAL codec (PIL) when installed and falls back to
a deterministic stand-in for undecodable payloads (all of this
container's, which has no codecs) — so the feature op is fully
oracle-paired while the Spark-side plumbing that matters at 100 TB is
real and tested: binary schema, per-batch Arrow transfer,
frame-sampling fan-out, and partition-preserving metadata extraction.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from pro_etl_spark.io import load
from pro_etl_spark.ops.hashing import DUCK_HASH60, hash60
from pro_etl_spark.registry import register


try:  # optional codec: absent in this container, real on a prod image
    import io as _io

    from PIL import Image as _PILImage

    _HAVE_PIL = True
except ImportError:  # pragma: no cover
    _HAVE_PIL = False


def decode_image(payload: bytes) -> "object":
    """Real image decode via PIL when the codec is installed; raises
    NotImplementedError in codec-less containers (this one)."""
    if not _HAVE_PIL:
        raise NotImplementedError(
            "image codecs are not available in this environment; "
            "decode_meta falls back to the deterministic stand-in"
        )
    return _PILImage.open(_io.BytesIO(payload))


def fake_decode_meta(payload: bytes) -> tuple[int, int]:
    """Deterministic stand-in for decode: derive a fake (width, height)
    from the payload length."""
    n = len(payload)
    return (320 + n % 320, 240 + n % 240)


def decode_meta(payload: bytes) -> tuple[int, int]:
    """(width, height) of a payload: the REAL decode when a codec is
    present and the payload is a decodable image, else the
    deterministic fallback. The synthetic corpus payloads are utf-8
    text (never a valid image), so the oracle below can rely on the
    fallback being taken for every row, codec installed or not."""
    if _HAVE_PIL:
        try:
            img = decode_image(payload)
            return (int(img.width), int(img.height))
        except NotImplementedError:
            raise
        except Exception:
            pass  # not a decodable image — fall through to the stand-in
    return fake_decode_meta(payload)


def binary_manifest(docs: DataFrame) -> DataFrame:
    """Model a multimodal corpus: payload = utf-8 bytes of the text
    column (an opaque blob as far as the engine cares) + typed
    metadata columns."""
    return docs.select(
        "doc_id",
        F.encode("text", "UTF-8").alias("payload"),
        F.lit("application/octet-stream").alias("mime"),
        F.octet_length(F.encode("text", "UTF-8")).cast("long").alias("n_bytes"),
    )


@register(
    "mm_manifest",
    oracle=f"""
    SELECT doc_id,
           'application/octet-stream' AS mime,
           CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
           {DUCK_HASH60.format(x="text")} % 1000 AS content_bucket
    FROM documents
    """,
)
def mm_manifest(spark: SparkSession, d: str) -> DataFrame:
    """Binary-column manifest: payload sizes + a content-hash bucket
    (the partition key a 100 TB media lake would colocate on)."""
    m = binary_manifest(load(spark, d, "documents"))
    return m.select(
        "doc_id",
        "mime",
        "n_bytes",
        (hash60(F.decode("payload", "UTF-8")) % 1000).alias("content_bucket"),
    )


@register(
    "mm_frame_sample",
    oracle="""
    SELECT doc_id,
           CAST(unnest(range(0, CAST(octet_length(encode(text)) AS BIGINT), 100))
                AS BIGINT) AS frame_offset
    FROM documents
    """,
)
def mm_frame_sample(spark: SparkSession, d: str) -> DataFrame:
    """Frame sampling fan-out: one row per sampled frame offset (every
    100th byte) — the explode pattern a video pipeline uses to turn
    one blob row into N frame rows without driver involvement."""
    m = binary_manifest(load(spark, d, "documents"))
    # empty payloads yield no frames (sequence(0,-1) would throw); the
    # when-guard mirrors the oracle's empty range(0,0)
    offsets = F.when(
        F.col("n_bytes") > 0,
        F.sequence(F.lit(0).cast("long"), F.col("n_bytes") - 1, F.lit(100).cast("long")),
    ).otherwise(F.array().cast("array<long>"))
    return m.select("doc_id", F.explode(offsets).alias("frame_offset"))


@register(
    "mm_decode_features",
    oracle="""
    WITH b AS (
      SELECT doc_id, hex(encode(text)) AS hx,
             octet_length(encode(text)) AS n
      FROM documents
    )
    SELECT doc_id,
           CAST(320 + n % 320 AS BIGINT) AS width,
           CAST(240 + n % 240 AS BIGINT) AS height,
           CASE WHEN n = 0 THEN 0.0 ELSE
             CAST(list_reduce(list_prepend(CAST(0 AS BIGINT),
               list_transform(range(1, n + 1),
                 i -> ('0x' || substr(hx, 2 * i - 1, 2))::BIGINT)),
               (a, v) -> a + v) AS DOUBLE) / n END AS mean_byte
    FROM b
    """,
)
def mm_decode_features(spark: SparkSession, d: str) -> DataFrame:
    """Decode/feature-extract stage: mapInPandas over Arrow record
    batches of binary payloads → (doc_id, width, height, mean_byte).
    ``decode_meta`` attempts a REAL decode when a codec (PIL) is
    installed and falls back to the deterministic stand-in for
    non-image payloads — which is every row of this corpus, so the
    DuckDB oracle reproduces the fallback exactly (width/height from
    payload length; mean_byte = byte-sum / length, an exact integer
    division that is bit-identical cross-engine). The batch shape,
    binary transfer, and schema are production-real."""
    m = binary_manifest(load(spark, d, "documents"))

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            meta = pdf["payload"].map(decode_meta)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "width": meta.map(lambda m: m[0]).astype("int64"),
                    "height": meta.map(lambda m: m[1]).astype("int64"),
                    "mean_byte": pdf["payload"].map(
                        lambda b: float(sum(b)) / len(b) if len(b) else 0.0
                    ),
                }
            )

    return m.mapInPandas(
        extract, "doc_id long, width long, height long, mean_byte double"
    )


# --- binary chunk-fingerprint near-dup -------------------------------

#: fixed chunk width (bytes/chars) for payload fingerprinting. Real
#: media dedup uses content-defined chunking (rolling-hash cut points,
#: FastCDC); fixed-width keeps the fingerprint oracle-checkable while
#: exercising the identical plan: chunk → hash → inverted index → pair
#: evidence.
CHUNK_BYTES = 32

#: chunk hashes present in more than this many payloads are shared
#: boilerplate (container headers, padding), not near-dup evidence —
#: and the cap also bounds the per-chunk pair fan-out at scale
CHUNK_MAX_DF = 64

#: minimum shared distinct chunks for a near-dup verdict
CHUNK_MIN_SHARED = 2


@register(
    "mm_chunk_dedup",
    oracle=f"""
    WITH c AS (
      SELECT DISTINCT doc_id,
             {DUCK_HASH60.format(x=f"substr(text, i * {CHUNK_BYTES} + 1, {CHUNK_BYTES})")} AS h
      FROM documents,
           UNNEST(range(0, CAST(ceil(length(text) / {CHUNK_BYTES}.0) AS BIGINT)))
             AS u(i)
    ), keep AS (
      SELECT h FROM c GROUP BY h
      HAVING count(*) BETWEEN 2 AND {CHUNK_MAX_DF}
    )
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           CAST(count(*) AS BIGINT) AS n_shared
    FROM c a JOIN c b ON a.h = b.h AND a.doc_id < b.doc_id
    WHERE a.h IN (SELECT h FROM keep)
    GROUP BY a.doc_id, b.doc_id
    HAVING count(*) >= {CHUNK_MIN_SHARED}
    """,
)
def mm_chunk_dedup(spark: SparkSession, d: str) -> DataFrame:
    """Binary near-dup detection by chunk fingerprinting: split every
    payload into fixed CHUNK_BYTES chunks, hash each chunk, and report
    payload pairs sharing ≥ CHUNK_MIN_SHARED distinct chunk hashes
    (chunks shared by > CHUNK_MAX_DF payloads are boilerplate and
    ignored). This is the dedup that catches re-encoded-container /
    appended-metadata copies of the same media blob, which whole-file
    md5 (dedup_exact) misses.

    Scale: the inverted index shuffles 60-bit chunk hashes only; pairs
    expand IN-ROW inside each ≤ CHUNK_MAX_DF posting list (same
    bounded fan-out as MinHash-LSH, ops/dedup.py) — never an unbounded
    self-join, so a pathological common chunk cannot quadratically
    explode. The payload here is the utf-8 text blob (this container
    has no media codecs); on real media the chunker runs over the raw
    binary column with identical plan shape."""
    m = binary_manifest(load(spark, d, "documents"))
    # chunk count over CHARACTERS of the decoded blob, matching the
    # oracle's length(text) — identical to bytes on this ascii corpus
    chunks = (
        m.select(
            "doc_id",
            F.decode("payload", "UTF-8").alias("txt"),
        )
        .select(
            "doc_id",
            "txt",
            F.ceil(F.length("txt") / float(CHUNK_BYTES))
            .cast("int")
            .alias("n_chunks"),
        )
        .where(F.col("n_chunks") > 0)
        .select(
            "doc_id",
            F.explode(
                F.array_distinct(
                    F.transform(
                        F.sequence(F.lit(0), F.col("n_chunks") - 1),
                        lambda i: hash60(
                            F.substring(
                                F.col("txt"),
                                i * CHUNK_BYTES + 1,
                                CHUNK_BYTES,
                            )
                        ),
                    )
                )
            ).alias("h"),
        )
    )
    postings = (
        chunks.groupBy("h")
        .agg(F.sort_array(F.collect_list("doc_id")).alias("ids"))
        .where(F.size("ids").between(2, CHUNK_MAX_DF))
    )
    pair_structs = F.flatten(
        F.transform(
            F.col("ids"),
            lambda x, i: F.transform(
                F.slice(F.col("ids"), i + 2, CHUNK_MAX_DF),
                lambda y: F.struct(x.alias("doc_a"), y.alias("doc_b")),
            ),
        )
    )
    return (
        postings.select(F.explode(pair_structs).alias("p"))
        .groupBy(
            F.col("p.doc_a").alias("doc_a"), F.col("p.doc_b").alias("doc_b")
        )
        .agg(F.count("*").alias("n_shared"))
        .where(F.col("n_shared") >= CHUNK_MIN_SHARED)
        .select("doc_a", "doc_b", F.col("n_shared").cast("long").alias("n_shared"))
    )


#: audio-style framing: samples per frame (non-overlapping hop)
FRAME_LEN = 64


# Shared expression builders for the audio family (ADVICE r12): the
# pcm / n_frames / frames / energies pipeline was copy-pasted across
# mm_audio_energy, mm_scene_cuts, mm_audio_vad_segments and
# mm_audio_dynamic_range, and oracle hash parity depends on the copies
# staying bit-identical — any drift in one would silently diverge the
# others. Pure Column builders (no plan-shape impact): each returns the
# exact expression the inline copies built, reading the same
# ``pcm`` / ``frame`` column names.

def _audio_pcm():
    """Character-code PCM stand-in stream over ``text``."""
    return F.transform(F.split(F.col("text"), ""), lambda c: F.ascii(c))


def _audio_n_frames():
    """Frame count ⌈len(pcm)/FRAME_LEN⌉ (reads the ``pcm`` column)."""
    return F.ceil(F.size("pcm") / F.lit(float(FRAME_LEN))).cast("long")


def _audio_frames():
    """array<array<int>> of non-overlapping FRAME_LEN-sample frames
    (reads the ``pcm`` column)."""
    return F.transform(
        F.sequence(F.lit(0), _audio_n_frames() - 1),
        lambda i: F.slice(F.col("pcm"), i * FRAME_LEN + 1, FRAME_LEN),
    )


def _audio_energies():
    """array<long> of per-frame Σs² integer energies computed in-row
    (reads the ``pcm`` column)."""
    return F.transform(
        F.sequence(F.lit(0), _audio_n_frames() - 1),
        lambda i: F.aggregate(
            F.transform(
                F.slice(F.col("pcm"), i * FRAME_LEN + 1, FRAME_LEN),
                lambda x: (x * x).cast("long"),
            ),
            F.lit(0).cast("long"),
            lambda acc, v: acc + v,
        ),
    )


def _frame_energy():
    """Per-frame Σs² integer energy (reads the exploded ``frame``
    column)."""
    return F.aggregate(
        F.transform(F.col("frame"), lambda x: (x * x).cast("long")),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    )


@register(
    "mm_audio_energy",
    oracle=f"""
    WITH s AS (
      SELECT doc_id,
             list_transform(regexp_split_to_array(text, ''),
                            c -> unicode(c)) AS pcm
      FROM documents
    ), framed AS (
      SELECT doc_id, CAST(i AS BIGINT) AS frame_idx,
             list_slice(pcm, i * {FRAME_LEN} + 1, (i + 1) * {FRAME_LEN})
               AS frame
      FROM s, LATERAL (SELECT unnest(
               range(0, CAST(ceil(len(pcm) / {FRAME_LEN}.0) AS BIGINT))) AS i)
      WHERE len(pcm) > 0
    )
    SELECT doc_id, frame_idx,
           CAST(len(frame) AS BIGINT) AS n_samples,
           CAST(list_reduce(list_prepend(CAST(0 AS BIGINT),
                  list_transform(frame, x -> CAST(x * x AS BIGINT))),
                  (acc, v) -> acc + v) AS BIGINT) AS energy,
           CAST(list_max(frame) AS BIGINT) AS peak,
           sqrt(CAST(list_reduce(list_prepend(CAST(0 AS BIGINT),
                  list_transform(frame, x -> CAST(x * x AS BIGINT))),
                  (acc, v) -> acc + v) AS DOUBLE) / len(frame)) AS rms
    FROM framed
    """,
)
def mm_audio_energy(spark: SparkSession, d: str) -> DataFrame:
    """Audio-pipeline framing plumbing: treat each payload's bytes as
    a PCM sample stream (stand-in: the text's character codes — the
    container ships no audio codec, same policy as ``decode_meta``),
    window it into non-overlapping {FRAME_LEN}-sample frames IN-ROW,
    and emit per-frame integer energy (Σs² — exact BIGINT on both
    engines), peak, and RMS (one exactly-rounded sqrt+divide). This is
    the VAD / silence-trim / loudness-normalization front-end shape:
    decode → frame → per-frame feature, all map-only — a 100 TB audio
    lake frames without any shuffle, and the frame table partitions
    however the feature store wants."""
    pcm = _audio_pcm()
    frames = _audio_frames()
    energy = _frame_energy()
    # stacked select: ``energy`` (a per-frame Σs² HOF aggregate) is
    # needed by both the energy column and rms; HOFs are
    # CodegenFallback so whole-stage subexpression elimination never
    # dedupes them — materialize it once, then derive rms (r12; the
    # multi-referenced-producer CollapseProject rule keeps the stage)
    return (
        load(spark, d, "documents")
        .select("doc_id", pcm.alias("pcm"))
        .where(F.size("pcm") > 0)
        .select("doc_id", F.posexplode(frames).alias("frame_idx", "frame"))
        .select(
            "doc_id",
            F.col("frame_idx").cast("long").alias("frame_idx"),
            F.size("frame").cast("long").alias("n_samples"),
            energy.alias("energy"),
            F.array_max("frame").cast("long").alias("peak"),
        )
        .select(
            "doc_id",
            "frame_idx",
            "n_samples",
            "energy",
            "peak",
            F.sqrt(F.col("energy").cast("double") / F.col("n_samples"))
            .alias("rms"),
        )
    )


@register(
    "mm_scene_cuts",
    oracle=f"""
    WITH s AS (
      SELECT doc_id,
             list_transform(regexp_split_to_array(text, ''),
                            c -> unicode(c)) AS pcm
      FROM documents
    ), framed AS (
      SELECT doc_id, CAST(i AS BIGINT) AS frame_idx,
             list_reduce(list_prepend(CAST(0 AS BIGINT),
               list_transform(
                 list_slice(pcm, i * {FRAME_LEN} + 1, (i + 1) * {FRAME_LEN}),
                 x -> CAST(x * x AS BIGINT))),
               (acc, v) -> acc + v) AS energy
      FROM s, LATERAL (SELECT unnest(
               range(0, CAST(ceil(len(pcm) / {FRAME_LEN}.0) AS BIGINT))) AS i)
      WHERE len(pcm) > 0
    ), lagged AS (
      SELECT doc_id, frame_idx, energy,
             LAG(energy) OVER (PARTITION BY doc_id ORDER BY frame_idx)
               AS prev_energy
      FROM framed
    )
    -- prev_energy graded as DOUBLE on both sides: NULL on each doc's
    -- first frame, and a nullable integer oracle column materializes
    -- as float64 through the driver's pandas path
    SELECT doc_id, frame_idx, energy,
           CAST(prev_energy AS DOUBLE) AS prev_energy,
           COALESCE(abs(energy - prev_energy) * 5 > energy + prev_energy,
                    FALSE) AS is_cut
    FROM lagged
    """,
)
def mm_scene_cuts(spark: SparkSession, d: str) -> DataFrame:
    """Scene-cut detection plumbing: frame the payload stream (same
    {FRAME_LEN}-sample windows as ``mm_audio_energy``), then flag
    frames whose energy jumps more than 40% of the neighboring mean —
    the shot-boundary heuristic a video pipeline runs before clip
    sampling, expressed as one lag window over the frame table. The
    cut test is an integer cross-multiplication (|Δ|·5 > eᵢ+eᵢ₋₁), so
    the flag is bit-exact cross-engine — no float threshold.

    Scale: framing is map-only (in-row fan-out); the only shuffle is
    the per-document lag window, keyed by doc — and a 100 TB video
    lake's frame table partitions by doc_id already, so the window is
    partition-local."""
    pcm = _audio_pcm()
    frames = _audio_frames()
    energy = _frame_energy()
    from pyspark.sql import Window as W

    lagw = W.partitionBy("doc_id").orderBy("frame_idx")
    framed = (
        load(spark, d, "documents")
        .select("doc_id", pcm.alias("pcm"))
        .where(F.size("pcm") > 0)
        .select("doc_id", F.posexplode(frames).alias("frame_idx", "frame"))
        .select(
            "doc_id",
            F.col("frame_idx").cast("long").alias("frame_idx"),
            energy.alias("energy"),
        )
        .withColumn("prev_energy", F.lag("energy").over(lagw))
    )
    return framed.select(
        "doc_id",
        "frame_idx",
        "energy",
        F.col("prev_energy").cast("double").alias("prev_energy"),
        F.coalesce(
            F.abs(F.col("energy") - F.col("prev_energy")) * 5
            > F.col("energy") + F.col("prev_energy"),
            F.lit(False),
        ).alias("is_cut"),
    )


TILE_PX = 128  # tile edge for the vision-preprocessing crop grid


@register(
    "mm_image_tiles",
    oracle=f"""
    WITH dims AS (
      SELECT doc_id,
             320 + octet_length(encode(text)) % 320 AS w,
             240 + octet_length(encode(text)) % 240 AS h
      FROM documents
    ), g AS (
      SELECT doc_id, w, h,
             CAST(ceil(w / {TILE_PX}.0) AS BIGINT) AS nx,
             CAST(ceil(h / {TILE_PX}.0) AS BIGINT) AS ny
      FROM dims
    ), t AS (
      SELECT doc_id, w, h, nx,
             unnest(range(0, nx * ny)) AS i
      FROM g
    )
    SELECT doc_id,
           CAST(i % nx AS BIGINT) AS tile_x,
           CAST(i // nx AS BIGINT) AS tile_y,
           CAST((i % nx) * {TILE_PX} AS BIGINT) AS x0,
           CAST((i // nx) * {TILE_PX} AS BIGINT) AS y0,
           CAST(LEAST((i % nx) * {TILE_PX} + {TILE_PX}, w) AS BIGINT) AS x1,
           CAST(LEAST((i // nx) * {TILE_PX} + {TILE_PX}, h) AS BIGINT) AS y1
    FROM t
    """,
)
def mm_image_tiles(spark: SparkSession, d: str) -> DataFrame:
    """Vision-preprocessing tile manifest: one row per TILE_PX-square
    crop of each image's (width, height) grid, edge tiles clamped —
    the fan-out a ViT-style pipeline runs before patch extraction, as
    pure engine plumbing (the decode itself stays in
    ``mm_decode_features``; dims reuse its documented deterministic
    fallback so the oracle recomputes them from payload length). One
    ``sequence``+``explode`` per row generates the whole grid —
    tx = i mod nx, ty = i div nx — all-integer, no UDF.

    Scale: narrow explode (≤20 rows/image at these dims), no shuffle;
    at 100 TB the tile manifest partitions by the same content bucket
    as the payload column so crop workers read locally."""
    m = binary_manifest(load(spark, d, "documents"))
    w = 320 + F.col("n_bytes") % 320
    h = 240 + F.col("n_bytes") % 240
    nx = F.ceil(w / float(TILE_PX)).cast("long")
    ny = F.ceil(h / float(TILE_PX)).cast("long")
    g = m.select(
        "doc_id",
        w.alias("w"),
        h.alias("h"),
        nx.alias("nx"),
        F.explode(
            F.sequence(F.lit(0).cast("long"), nx * ny - 1)
        ).alias("i"),
    )
    tx = F.col("i") % F.col("nx")
    ty = (F.col("i") / F.col("nx")).cast("long")
    return g.select(
        "doc_id",
        tx.cast("long").alias("tile_x"),
        ty.alias("tile_y"),
        (tx * TILE_PX).cast("long").alias("x0"),
        (ty * TILE_PX).cast("long").alias("y0"),
        F.least(tx * TILE_PX + TILE_PX, F.col("w")).cast("long").alias("x1"),
        F.least(ty * TILE_PX + TILE_PX, F.col("h")).cast("long").alias("y1"),
    )


CDC_WIN = 8  # rolling-hash window (bytes/chars)
CDC_BASE = 257  # polynomial base
CDC_MOD = 1_000_003  # hash modulus
CDC_MASK = 64  # cut where h % CDC_MASK == 0 (expected chunk ~64)
#: B^j mod P precomputed (B^7 overflows double precision — pow() in
#: either engine would silently round; literals keep it exact)
CDC_POWS = [1, 257, 66049, 974545, 457315, 529604, 107820, 709659]


CDC_POWS_SQL = ", ".join(str(p) for p in CDC_POWS)


@register(
    "mm_chunk_cdc",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, text, length(text) AS n FROM documents
      WHERE length(text) >= {CDC_WIN}
    ), cuts AS (
      SELECT doc_id, n,
             list_prepend(CAST(0 AS BIGINT), list_filter(
               list_transform(range({CDC_WIN}, n + 1), i ->
                 CASE WHEN list_reduce(
                        list_transform(range(0, {CDC_WIN}), j ->
                          (ascii(substr(text, CAST(i - j AS INT), 1))
                           * ([{CDC_POWS_SQL}])[CAST(j + 1 AS INT)])
                          % {CDC_MOD}),
                        (a, v) -> (a + v) % {CDC_MOD}
                      ) % {CDC_MASK} = 0
                      THEN CAST(i AS BIGINT) ELSE NULL END),
               x -> x IS NOT NULL)) AS starts
      FROM t
    )
    SELECT doc_id,
           CAST(generate_subscripts(starts, 1) - 1 AS BIGINT) AS chunk_idx,
           CAST(unnest(starts) AS BIGINT) AS chunk_start,
           CAST(COALESCE(starts[generate_subscripts(starts, 1) + 1], n)
                - unnest(starts) AS BIGINT) AS chunk_len
    FROM cuts
    """,
)
def mm_chunk_cdc(spark: SparkSession, d: str) -> DataFrame:
    """CONTENT-DEFINED chunking — the rolling-hash cut-point selection
    (FastCDC's core idea) that ``mm_chunk_dedup``'s fixed-width
    chunking explicitly documents as the production technique: cut
    wherever the W-byte polynomial window hash ≡ 0 (mod CDC_MASK), so
    an insertion near the start of a payload shifts only the ONE chunk
    it lands in — fixed-width chunking would shift every boundary
    after it and destroy all downstream fingerprint matches. The
    rolling hash is pure integer arithmetic (codepoint·B^j mod P), so
    cut positions are bit-identical cross-engine and the whole
    boundary table gets a value oracle — upgrading the documented
    fixed-width limitation.

    Implementation note (measured at sf0.1): per-char Catalyst lambdas
    are the WRONG tool for byte-level codec work — the windowed
    higher-order-function form ran 26 s and an in-row fold with an
    array accumulator 203 s (immutable-array copying per step); the
    Arrow-vectorized numpy pass below runs ~2 s. That boundary —
    relational expressions JVM-side, byte-twiddling in vectorized
    Python/codec land — is exactly where ``mm_decode_features``
    already sits, and where a 100 TB media pipeline puts its chunker.

    Scale: O(n·W) vectorized integer work per payload inside
    ``mapInPandas`` (Arrow batches, no shuffle, no driver
    involvement); chunk rows fan out inside the same stage. Payloads
    shorter than the window are skipped (no window fits)."""
    import numpy as np

    t = (
        load(spark, d, "documents")
        .where(F.length("text") >= CDC_WIN)
        .select("doc_id", "text")
    )
    kernel = np.array(CDC_POWS[::-1], dtype=np.int64)

    def chunker(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from numpy.lib.stride_tricks import sliding_window_view

        for pdf in batches:
            out_doc, out_idx, out_start, out_len = [], [], [], []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                codes = np.frombuffer(
                    text.encode("ascii", "replace"), dtype=np.uint8
                ).astype(np.int64)
                n = len(codes)
                # h[e] = sum_j code[e-j]*B^j mod P for window end e
                h = (sliding_window_view(codes, CDC_WIN) @ kernel) % CDC_MOD
                ends = np.flatnonzero(h % CDC_MASK == 0) + CDC_WIN
                starts = np.concatenate(([0], ends[ends < n + 1]))
                # drop a duplicate 0 if a cut lands exactly at... (cuts
                # are >= CDC_WIN >= 1, so 0 never duplicates)
                lens = np.diff(np.concatenate((starts, [n])))
                k = len(starts)
                out_doc.extend([doc_id] * k)
                out_idx.extend(range(k))
                out_start.extend(starts.tolist())
                out_len.extend(lens.tolist())
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(out_doc, dtype="int64"),
                    "chunk_idx": pd.Series(out_idx, dtype="int64"),
                    "chunk_start": pd.Series(out_start, dtype="int64"),
                    "chunk_len": pd.Series(out_len, dtype="int64"),
                }
            )

    return t.mapInPandas(
        chunker,
        "doc_id long, chunk_idx long, chunk_start long, chunk_len long",
    )


#: container frame magic for mm_header_parse (2 bytes)
MM_MAGIC = "4D4D"  # "MM"


@register(
    "mm_header_parse",
    oracle=f"""
    WITH framed AS (
      SELECT doc_id,
             from_hex('{MM_MAGIC}')
               || from_hex(lpad(to_hex(n_chars % 4096), 8, '0'))
               || from_hex(lpad(to_hex((n_chars * 3) % 4096), 8, '0'))
               || encode(text) AS frame
      FROM documents WHERE doc_id % 13 = 0
    )
    SELECT doc_id,
           substr(hex(frame), 1, 4) = '{MM_MAGIC}' AS magic_ok,
           CAST(('0x' || substr(hex(frame), 5, 8))::BIGINT AS BIGINT)
             AS width,
           CAST(('0x' || substr(hex(frame), 13, 8))::BIGINT AS BIGINT)
             AS height,
           CAST(octet_length(frame) - 10 AS BIGINT) AS payload_bytes
    FROM framed
    """,
)
def mm_header_parse(spark: SparkSession, d: str) -> DataFrame:
    """Binary CONTAINER FRAMING + header parsing — the byte-level
    plumbing every multimodal lake format needs (TFRecord, WARC,
    RecordIO all frame opaque payloads behind fixed headers): each
    payload is wrapped as [2-byte magic 'MM' | 4-byte big-endian
    width | 4-byte big-endian height | payload], then the header is
    parsed BACK with pure binary slicing (substring over BinaryType)
    and hex->integer conversion — no UDF, no decode; the JVM and
    DuckDB agree byte for byte because the frame layout is explicit.
    Integer<->bytes goes through hex with fixed zero-padding, the
    portable spelling of big-endian encoding. In production the
    framing runs at ingest and THIS parse is the cheap manifest scan
    that never touches the payload bytes beyond the header — exactly
    how ``mm_manifest``'s stats stay narrow on 100 TB of media.

    Scale: narrow projection, zero shuffle; header reads on a framed
    format are offset reads, not full-payload scans."""
    docs = load(spark, d, "documents").where(F.col("doc_id") % 13 == 0)
    w = F.col("n_chars") % 4096
    h = (F.col("n_chars") * 3) % 4096
    i2b4 = lambda c: F.unhex(F.lpad(F.hex(c), 8, "0"))  # noqa: E731
    frame = F.concat(
        F.unhex(F.lit(MM_MAGIC)), i2b4(w), i2b4(h), F.encode("text", "UTF-8")
    )
    framed = docs.select("doc_id", frame.alias("frame"))
    return framed.select(
        "doc_id",
        (F.hex(F.substring("frame", 1, 2)) == MM_MAGIC).alias("magic_ok"),
        F.conv(F.hex(F.substring("frame", 3, 4)), 16, 10)
        .cast("long")
        .alias("width"),
        F.conv(F.hex(F.substring("frame", 7, 4)), 16, 10)
        .cast("long")
        .alias("height"),
        (F.octet_length("frame") - 10).cast("long").alias("payload_bytes"),
    )


# --- perceptual hash (DCT pHash) ---------------------------------------


def _let(expr, fn):
    """Single-evaluation LET-binding inside one projection: transform
    over a 1-element array binds ``expr`` to a lambda VARIABLE, which
    the higher-order-function evaluator computes once per row — every
    reference inside ``fn`` reads the bound value. This is the in-plan
    workaround for the no-CSE-across-lambda-boundaries hazard (see the
    dedup-family cached token tables for the cache-barrier variant):
    a single-referenced projection column gets inlined by
    CollapseProject, and once the producer expression sits INSIDE a
    downstream lambda it re-evaluates per element — chained stages
    make that multiplicative. ``_let`` keeps the pipeline one narrow
    map-only projection with each stage evaluated exactly once."""
    return F.element_at(F.transform(F.array(expr), fn), 1)

#: 8x8 DCT-II basis C[u][x] = norm(u) * cos(pi * (2x+1) * u / 16),
#: precomputed in Python to 12 dp and inlined as shared literals in
#: BOTH plans — cos() is not bit-portable across engines, a table of
#: shared constants is (the _DECAY_W / nDCG-discount discipline).
_PHASH_BASIS = [
    (
        u,
        x,
        round(
            (
                (1.0 / 8.0) ** 0.5
                if u == 0
                else (2.0 / 8.0) ** 0.5
            )
            * __import__("math").cos(
                __import__("math").pi * (2 * x + 1) * u / 16.0
            ),
            12,
        ),
    )
    for u in range(8)
    for x in range(8)
]

_PHASH_BASIS_SQL = "(VALUES " + ",".join(
    f"({u}, {x}, CAST({c!r} AS DOUBLE))" for u, x, c in _PHASH_BASIS
) + ")"


@register(
    "mm_phash",
    # two sweep-driven plan choices (round 8, 40.8 s -> ~3 s at sf0.1):
    # (1) the fan-out carries a 32-char CONTENT KEY (md5 of the text),
    #     never the payload itself — hashing the full text once per
    #     (doc × 64 cells × basis fan-out) dominated the first cut;
    # (2) the 2D DCT is SEPARABLE: a column pass (Σ_y C[v,y]·val,
    #     micro-quantized) then a row pass (Σ_x C[u,x]·G) — 1024 join
    #     rows per doc instead of the naive 4096 outer-product terms.
    oracle=f"""
    WITH ck AS (
      SELECT doc_id, md5(text) AS key FROM documents
    ), cells AS (
      SELECT doc_id,
             CAST(r.range AS BIGINT) // 8 AS x,
             CAST(r.range AS BIGINT) % 8 AS y,
             CAST({DUCK_HASH60.format(
                 x="(key || ':ph:' || CAST(r.range AS VARCHAR))")} % 256
               AS DOUBLE) AS val
      FROM ck, range(64) r
    ), cb AS (
      SELECT * FROM {_PHASH_BASIS_SQL} AS t(u, xx, c)
    ), g AS (
      SELECT cells.doc_id, cells.x, bv.u AS v,
             SUM(CAST(FLOOR(cells.val * bv.c * 1000000.0 + 0.5)
                      AS BIGINT)) AS g_micros
      FROM cells JOIN cb bv ON bv.xx = cells.y
      GROUP BY cells.doc_id, cells.x, bv.u
    ), f AS (
      SELECT g.doc_id, bu.u AS u, g.v,
             SUM(CAST(FLOOR(g.g_micros * bu.c * 1000.0 + 0.5)
                      AS BIGINT)) AS f_nanos
      FROM g JOIN cb bu ON bu.xx = g.x
      GROUP BY g.doc_id, bu.u, g.v
    ), ranked AS (
      SELECT doc_id, u, v, f_nanos,
             ROW_NUMBER() OVER (PARTITION BY doc_id
                                ORDER BY f_nanos, u, v) AS rn
      FROM f WHERE NOT (u = 0 AND v = 0)
    ), med AS (
      SELECT doc_id, f_nanos AS m FROM ranked WHERE rn = 32
    )
    SELECT r.doc_id,
           CAST(SUM(CASE WHEN r.f_nanos > med.m
                         THEN CAST(1 AS BIGINT) << (8 * r.u + r.v - 1)
                         ELSE 0 END) AS BIGINT) AS phash,
           CAST(SUM(CASE WHEN r.f_nanos > med.m THEN 1 ELSE 0 END)
                AS BIGINT) AS n_bits_set
    FROM ranked r JOIN med ON med.doc_id = r.doc_id
    GROUP BY r.doc_id
    """,
)
def mm_phash(spark: SparkSession, d: str) -> DataFrame:
    """PERCEPTUAL HASH (DCT pHash) of each binary payload — the
    near-dup fingerprint for IMAGES, where exact hashes break on
    re-encodes: luma grid → 2D DCT-II → keep the 8×8 low-frequency
    block → bit = coefficient above the median → 63-bit signature
    (DC excluded, as the classic algorithm does). Signatures then
    feed the SAME Hamming-LSH machinery the text SimHash path uses
    (``dedup_simhash_lsh``) — this op is the image-side on-ramp.

    The DECODE step is the documented deterministic stand-in (this
    container ships no image codec — mm_decode_features:38 pattern):
    the 8×8 luma grid derives from the payload via the public md5
    recipe, so both engines see identical "pixels" and the REAL part
    — the Spark-side DCT/median/packing plumbing a production pHash
    needs — is fully exercised. Swap the grid stage for a Pandas-UDF
    PIL resize when a codec exists; nothing downstream changes.

    Exactness: DCT basis constants are Python-precomputed shared
    literals (cos is not bit-portable); each separable-pass term
    floor-quantizes to an integer grid BEFORE its sum (micros for the
    column pass, nanos total — order-independent both passes); the
    median is a deterministic rank-32 pick with (value, u, v)
    tie-break; the packed hash is an exact integer sum of distinct
    powers of two.

    Scale (sweep-driven, rounds 8-9): the fan-out carries a 32-char
    md5 CONTENT KEY, never the payload (hashing the full text per
    cell dominated the first cut: 40.8 s → ~3 s at sf0.1). The 64
    luma cells are plain codegen'd columns (the hashing is the
    irreducible JVM cost), and BOTH quantized DCT passes + the
    rank-32 median + the bit pack run as ONE vectorized Arrow pandas
    UDF over the cell array — measured 11 s at 10× vs 35 s for the
    round-8 basis-join plan (1024 rows/doc through two shuffles),
    ~20 s for an all-lambda in-row fold (HOF lambdas are never
    codegen'd), and 42 s for a plain-column DCT (1024 floor terms
    overflow Janino's 64 KB method limit and the whole fused stage
    silently drops to interpreted evaluation). This is the guide's
    "vectorized Pandas UDF when built-ins can't express it
    efficiently" clause applied deliberately: numpy float64
    multiply/floor is bit-identical to JVM doubles, every term
    quantizes to int64 BEFORE its sum, and the stable sort
    reproduces the oracle's ORDER BY f_nanos, u, v tie-break. Still
    no join, no explode, no shuffle — one narrow map-only pass."""
    docs = load(spark, d, "documents").select(
        "doc_id", F.md5("text").alias("key")
    )
    coef = {(u, x): c for u, x, c in _PHASH_BASIS}
    # stage 1: the 64-cell luma grid as plain columns (codegen'd md5).
    # Built as ONE selectExpr (r13): the Column-builder form issued
    # ~6500 py4j round-trips (64 × hash60's conv/substring/md5 chain),
    # ~1.2 s of pure construction per bench row; one parse call builds
    # the IDENTICAL expressions JVM-side (same conv/substring/md5/%/
    # cast ops — hash60's documented SQL spelling).
    s1 = docs.selectExpr(
        "doc_id",
        *[
            "CAST(CAST(conv(substring(md5(concat(key, ':ph:"
            + str(k)
            + "')), 1, 15), 16, 10) AS BIGINT) % 256 AS DOUBLE) AS v"
            + str(k)
            for k in range(64)
        ],
    )
    # stages 2-5 run as ONE Arrow-batched pandas UDF: the plain-column
    # form of this arithmetic (1024 floor-quantized DCT terms + the
    # rank-32 median + 63 CASE bits) overflows Janino's 64 KB
    # processNext() limit, silently dropping the WHOLE fused stage to
    # interpreted evaluation (42 s at 10× — slower than the lambda
    # fold it replaced), and lambda HOFs are never codegen'd at all
    # (~20 s). The md5 GRID stays JVM-side (codegen-friendly, and the
    # hashing is the irreducible ~7 s); the per-document matrix math
    # is exactly what the guide's "vectorized Pandas UDF when
    # built-ins can't express it efficiently" clause is for — numpy
    # float64 multiplication/floor is bit-identical to JVM doubles,
    # every term quantizes to int64 before summing, and the stable
    # sort reproduces the oracle's ORDER BY f_nanos, u, v (stable on
    # f_nanos preserves the (u, v) generation order for ties).
    import numpy as np
    from pyspark.sql.functions import pandas_udf

    cmat = [[coef[(u, x)] for x in range(8)] for u in range(8)]
    wvec = [
        (1 << (8 * u + v - 1)) if not (u == 0 and v == 0) else 0
        for u in range(8)
        for v in range(8)
    ]

    @pandas_udf("struct<phash: long, n_bits_set: long>")
    def _pack(varr):
        V = (
            np.stack(varr.values).astype(np.float64)
            if len(varr)
            else np.zeros((0, 64))
        )
        # NULL propagation (ADVICE r9): a NULL documents.text row
        # reaches this UDF as all-null grid cells (md5(NULL) → NULL),
        # which astype(float64) turns into NaN; without the mask the
        # int64 casts below would emit undefined garbage where the
        # oracle (and the old HOF plan) propagate NULL. Flag the rows
        # here, compute on zero-filled stand-ins, null the outputs.
        bad = np.isnan(V).any(axis=1)
        V = np.nan_to_num(V)
        n = V.shape[0]
        C = np.array(cmat)          # C[u][x]
        g = np.zeros((n, 8, 8), dtype=np.int64)   # g[., x, v]
        for x in range(8):
            for v in range(8):
                acc = np.zeros(n, dtype=np.int64)
                for y in range(8):
                    acc += np.floor(
                        V[:, x * 8 + y] * C[v, y] * 1_000_000.0 + 0.5
                    ).astype(np.int64)
                g[:, x, v] = acc
        f = np.zeros((n, 8, 8), dtype=np.int64)   # f[., u, v]
        for u in range(8):
            for v in range(8):
                acc = np.zeros(n, dtype=np.int64)
                for x in range(8):
                    acc += np.floor(
                        g[:, x, v].astype(np.float64) * C[u, x] * 1_000.0
                        + 0.5
                    ).astype(np.int64)
                f[:, u, v] = acc
        flat = f.reshape(n, 64)[:, 1:]            # drop (0,0): 63 ACs
        m = np.sort(flat, axis=1, kind="stable")[:, 31]  # rank 32
        above = flat > m[:, None]
        w = np.array(wvec[1:], dtype=np.int64)
        phash = pd.array((above * w).sum(axis=1), dtype="Int64")
        nbits = pd.array(above.sum(axis=1).astype("int64"), dtype="Int64")
        phash[bad] = None
        nbits[bad] = None
        return pd.DataFrame({"phash": phash, "n_bits_set": nbits})

    r = _pack(F.array(*[F.col(f"v{k}") for k in range(64)]))
    return s1.select("doc_id", r.alias("r")).select(
        "doc_id",
        F.col("r")["phash"].alias("phash"),
        F.col("r")["n_bits_set"].alias("n_bits_set"),
    )


# --- voice-activity segments ---------------------------------------------


def _vad_oracle() -> str:
    from pro_etl_spark.registry import ORACLES

    return f"""
    WITH fr AS ({ORACLES["mm_audio_energy"]}),
    tot AS (
      SELECT doc_id, SUM(energy) AS te, COUNT(*) AS nf
      FROM fr GROUP BY doc_id
    ), voiced AS (
      -- integer cross-multiply: energy >= mean(energy) without a
      -- division (energy * nf >= total_energy), exact in both engines
      SELECT f.doc_id, f.frame_idx, f.energy
      FROM fr f JOIN tot t USING (doc_id)
      WHERE f.energy * t.nf >= t.te
    ), flagged AS (
      SELECT doc_id, frame_idx, energy,
             CASE WHEN LAG(frame_idx) OVER (PARTITION BY doc_id
                                            ORDER BY frame_idx) IS NULL
                       OR frame_idx - LAG(frame_idx)
                            OVER (PARTITION BY doc_id
                                  ORDER BY frame_idx) > 1
                  THEN 1 ELSE 0 END AS new_seg
      FROM voiced
    ), segs AS (
      SELECT doc_id, frame_idx, energy,
             SUM(new_seg) OVER (PARTITION BY doc_id ORDER BY frame_idx
                                ROWS BETWEEN UNBOUNDED PRECEDING
                                         AND CURRENT ROW) AS seg_id
      FROM flagged
    )
    SELECT doc_id, CAST(seg_id AS BIGINT) AS seg_id,
           CAST(MIN(frame_idx) AS BIGINT) AS start_frame,
           CAST(MAX(frame_idx) AS BIGINT) AS end_frame,
           CAST(COUNT(*) AS BIGINT) AS n_frames,
           CAST(SUM(energy) AS BIGINT) AS seg_energy
    FROM segs GROUP BY doc_id, seg_id
    """


@register("mm_audio_vad_segments", oracle=_vad_oracle())
def mm_audio_vad_segments(spark: SparkSession, d: str) -> DataFrame:
    """VOICE-ACTIVITY segments — the VAD stage an audio-training
    pipeline runs after framing (``mm_audio_energy``'s front-end):
    frames at-or-above the document's mean energy are "voiced", and
    consecutive voiced frames merge into segments (gaps-and-islands on
    frame index — the ``sessionize`` machinery applied to media
    frames). Emits per segment the frame span, length, and integer
    energy — what a speech pipeline cuts clips by.

    Exactness: the threshold is an integer CROSS-MULTIPLY
    (energy·n_frames ≥ total_energy — mean comparison without
    division), and everything downstream is integer window logic.

    Scale: frames are doc-keyed (the energy pass is map-only); the
    island windows partition by doc_id — per-partition state is one
    document's frames. No shuffle beyond the doc-keyed aggregate."""
    # r12: per-doc totals fold IN-ROW. The old shape consumed the
    # framed-energy table twice (doc-keyed total aggregate + join
    # back), re-running the char-level framing pass on both sides and
    # paying a shuffle+join purely to attach (te, nf) — but every
    # frame of a document lives in ONE source row, so the energies
    # array, its sum and its size are one narrow projection and the
    # voiced filter needs no shuffle at all (guide §2.4). Same
    # integers: aggregate() over the array adds the same longs SUM()
    # added over rows, and posexplode yields the same 0-based
    # frame_idx.
    pcm = _audio_pcm()
    energies = _audio_energies()
    base = (
        load(spark, d, "documents")
        .select("doc_id", pcm.alias("pcm"))
        .where(F.size("pcm") > 0)
        .select("doc_id", energies.alias("es"))
    )
    # posexplode_OUTER, deliberately: plain posexplode makes
    # InferFiltersFromGenerate add a `size(es) > 0 AND isnotnull(es)`
    # guard, and predicate pushdown then inlines the WHOLE energies
    # derivation (split+ascii+frame Σs²) into a Filter below the
    # projection — evaluated twice more per row from raw text (r12
    # probe: 38.7 s vs 21.7 at 10× before this fix; the plan's Filter
    # node carried the full lambda twice). The outer form infers no
    # guard; es is never empty here (size(pcm) > 0 ⇒ ≥1 frame), and a
    # hypothetical null row would fail the voiced predicate anyway.
    fr = base.select(
        "doc_id",
        F.size("es").cast("long").alias("nf"),
        F.aggregate(
            F.col("es"), F.lit(0).cast("long"), lambda acc, v: acc + v
        ).alias("te"),
        F.posexplode_outer("es").alias("frame_idx", "energy"),
    )
    voiced = fr.where(F.col("energy") * F.col("nf") >= F.col("te")).select(
        "doc_id", F.col("frame_idx").cast("long").alias("frame_idx"), "energy"
    )
    wlag = Window.partitionBy("doc_id").orderBy("frame_idx")
    flagged = voiced.select(
        "doc_id",
        "frame_idx",
        "energy",
        F.when(
            F.lag("frame_idx").over(wlag).isNull()
            | (F.col("frame_idx") - F.lag("frame_idx").over(wlag) > 1),
            1,
        )
        .otherwise(0)
        .alias("new_seg"),
    )
    wrun = (
        Window.partitionBy("doc_id")
        .orderBy("frame_idx")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    segs = flagged.select(
        "doc_id",
        "frame_idx",
        "energy",
        F.sum("new_seg").over(wrun).alias("seg_id"),
    )
    return segs.groupBy("doc_id", "seg_id").agg(
        F.min("frame_idx").cast("long").alias("start_frame"),
        F.max("frame_idx").cast("long").alias("end_frame"),
        F.count("*").cast("long").alias("n_frames"),
        F.sum("energy").cast("long").alias("seg_energy"),
    ).select(
        "doc_id",
        F.col("seg_id").cast("long").alias("seg_id"),
        "start_frame",
        "end_frame",
        "n_frames",
        "seg_energy",
    )


PHASH_BANDS = 4          # 63-bit signature split into 4 × 16-bit bands
PHASH_HAMMING_MAX = 12   # verify threshold for a perceptual near-dup
#: skew guard, mirroring similarity.SRP_MAX_BUCKET / dedup.MAX_BUCKET:
#: band buckets larger than this are dropped as too-common before the
#: pair expansion, so a degenerate corpus (solid-color images,
#: template screenshots → identical signatures) caps the per-bucket
#: product at PHASH_MAX_BUCKET²/2 instead of going quadratic. The
#: census columns (n_buckets, max_bucket) still report ALL buckets —
#: the hot bucket must show up in the tuning table it feeds.
PHASH_MAX_BUCKET = 128


def _phash_near_dup_oracle() -> str:
    from pro_etl_spark.registry import ORACLES

    return f"""
    WITH ph AS ({ORACLES["mm_phash"]}),
    bands AS (
      SELECT doc_id, phash, CAST(b.range AS BIGINT) AS band,
             (phash >> CAST(16 * b.range AS INTEGER)) & 65535 AS band_val
      FROM ph, range({PHASH_BANDS}) b
    ), buckets AS (
      SELECT band, band_val, COUNT(*) AS sz
      FROM bands GROUP BY 1, 2
    ), capped AS (
      SELECT doc_id, phash, band, band_val FROM bands
      QUALIFY COUNT(*) OVER (PARTITION BY band, band_val)
              <= {PHASH_MAX_BUCKET}
    ), cand AS (
      SELECT a.band, a.doc_id AS doc_a, c.doc_id AS doc_b,
             bit_count(xor(a.phash, c.phash)) AS hamming
      FROM capped a JOIN capped c
        ON a.band = c.band AND a.band_val = c.band_val
       AND a.doc_id < c.doc_id
    )
    SELECT b.band,
           CAST(COUNT(DISTINCT b.band_val) AS BIGINT) AS n_buckets,
           CAST(MAX(b.sz) AS BIGINT) AS max_bucket,
           CAST(COALESCE(MAX(c.n_cand), 0) AS BIGINT) AS n_candidate_pairs,
           CAST(COALESCE(MAX(c.n_verified), 0) AS BIGINT) AS n_verified
    FROM buckets b
    LEFT JOIN (
      SELECT band, COUNT(*) AS n_cand,
             SUM(CASE WHEN hamming <= {PHASH_HAMMING_MAX} THEN 1 ELSE 0 END)
               AS n_verified
      FROM cand GROUP BY band
    ) c ON c.band = b.band
    GROUP BY b.band
    """


@register("mm_phash_near_dup", oracle=_phash_near_dup_oracle())
def mm_phash_near_dup(spark: SparkSession, d: str) -> DataFrame:
    """PERCEPTUAL NEAR-DUP census over the pHash signatures — the
    image-side twin of ``dedup_simhash_lsh``: split each 63-bit pHash
    into 4 × 16-bit bands, bucket by (band, value) so any pair agreeing
    on a full band collides somewhere (Hamming-LSH guarantee), and
    verify candidates by exact popcount distance ≤ 12. Reported as the
    per-band census (buckets, max bucket, candidate pairs, verified
    pairs) — the tuning table that says whether the band width holds
    the candidate volume sub-quadratic on THIS corpus, exactly what
    ``dedup_lsh_tuning_curves`` does for MinHash.

    Exactness: the pHash is the integer signature from ``mm_phash``;
    band extraction is shift/mask; Hamming is popcount of XOR —
    all-integer end to end.

    Scale: the bucket shuffle is keyed by (band, band_val) and carries
    the SIGNATURES (16 bytes/doc), never the payloads; buckets larger
    than PHASH_MAX_BUCKET are dropped as too-common BEFORE the pair
    expansion AND before any member list materializes (ADVICE r9: the
    cap rides a windowed per-(band, band_val) count — the oracle's
    QUALIFY shape — so a degenerate hot bucket of identical signatures
    never collects into one unbounded aggregation row; the window and
    the collect share the same hash partitioning, so no extra
    exchange). Pairs are generated IN-ROW from the capped
    bucket-collected member list (the ``_lsh_candidates`` pattern: no
    self-join, no O(pairs) shuffle — within one band a pair can
    collide in at most one bucket, so per-band counts need no
    distinct). The census columns still report ALL buckets, hot ones
    included — they ARE the tuning table: the bucket aggregate keeps
    every bucket's true size, and only the MEMBER COLLECT is capped
    (``collect_list`` skips the NULLs the windowed size gate emits for
    hot-bucket rows), so the one aggregation row a degenerate bucket
    produces holds an EMPTY list, never an unbounded one. Window,
    gate, and collect all ride the same (band, band_val) hash
    partitioning — one exchange, shared via ReusedExchange by the
    census and candidate consumers (a separate census aggregate over
    the raw bands frame measured 2× — it re-ran the pHash UDF because
    the subtrees no longer matched)."""
    ph = mm_phash(spark, d).select("doc_id", "phash")
    bands = ph.select(
        "doc_id",
        "phash",
        F.explode(F.sequence(F.lit(0), F.lit(PHASH_BANDS - 1))).alias("band"),
    ).withColumn(
        "band_val",
        F.expr("shiftright(phash, cast(band * 16 as int)) & 65535"),
    )
    wb = Window.partitionBy("band", "band_val")
    buckets = (
        bands.withColumn("sz", F.count("*").over(wb))
        .groupBy("band", "band_val")
        .agg(
            F.first("sz").alias("sz"),
            F.sort_array(
                F.collect_list(
                    F.when(
                        F.col("sz").between(2, PHASH_MAX_BUCKET),
                        F.struct("doc_id", "phash"),
                    )
                )
            ).alias("ms"),
        )
        # bounded cache barrier (≤ cap members per bucket row): the
        # census and candidate consumers prune different columns, so
        # their subtrees diverge and ReusedExchange cannot dedupe —
        # uncached, each re-ran the pHash UDF + window (measured 29 s
        # vs 5 s at 10×). The broadcast (cand) side materializes
        # first and fills the cache; the census side reads it.
        .cache()
    )
    pair_structs = F.flatten(
        F.transform(
            F.col("ms"),
            lambda x, i: F.transform(
                F.slice(F.col("ms"), i + 2, PHASH_MAX_BUCKET),
                lambda y: F.struct(
                    F.bit_count(
                        x["phash"].bitwiseXOR(y["phash"])
                    ).alias("hamming"),
                ),
            ),
        )
    )
    cand = (
        buckets.where(F.col("sz").between(2, PHASH_MAX_BUCKET))
        .select(F.col("band").alias("cband"), F.explode(pair_structs).alias("p"))
        .groupBy("cband")
        .agg(
            F.count("*").alias("n_cand"),
            F.sum(
                F.when(
                    F.col("p.hamming") <= PHASH_HAMMING_MAX, 1
                ).otherwise(0)
            ).alias("n_verified"),
        )
    )
    return (
        buckets.groupBy("band")
        .agg(
            F.countDistinct("band_val").cast("long").alias("n_buckets"),
            F.max("sz").cast("long").alias("max_bucket"),
        )
        .join(F.broadcast(cand), F.col("band") == F.col("cband"), "left")
        .select(
            F.col("band").cast("long").alias("band"),
            "n_buckets",
            "max_bucket",
            F.coalesce(F.col("n_cand"), F.lit(0)).cast("long").alias(
                "n_candidate_pairs"
            ),
            F.coalesce(F.col("n_verified"), F.lit(0)).cast("long").alias(
                "n_verified"
            ),
        )
    )


def _dhash_oracle() -> str:
    return f"""
    WITH ck AS (
      SELECT doc_id, md5(text) AS key FROM documents
    ), cells AS (
      SELECT doc_id,
             CAST(r.range AS BIGINT) // 8 AS x,
             CAST(r.range AS BIGINT) % 8 AS y,
             {DUCK_HASH60.format(
                 x="(key || ':ph:' || CAST(r.range AS VARCHAR))")} % 256
               AS val
      FROM ck, range(64) r
    )
    SELECT a.doc_id,
           CAST(SUM(CASE WHEN b.val > a.val
                         THEN CAST(1 AS BIGINT) << CAST(7 * a.x + a.y AS INT)
                         ELSE 0 END) AS BIGINT) AS dhash,
           CAST(SUM(CASE WHEN b.val > a.val THEN 1 ELSE 0 END) AS BIGINT)
             AS n_bits_set
    FROM cells a JOIN cells b
      ON b.doc_id = a.doc_id AND b.x = a.x AND b.y = a.y + 1
    GROUP BY a.doc_id
    """


@register("mm_dhash", oracle=_dhash_oracle())
def mm_dhash(spark: SparkSession, d: str) -> DataFrame:
    """DIFFERENCE HASH (dHash) — the gradient-based perceptual
    fingerprint beside the DCT ``mm_phash``: one bit per horizontal
    neighbor comparison on the same 8×8 luma grid (is the pixel to the
    right brighter?), 56 bits packed into one BIGINT. dHash survives
    brightness/contrast shifts that break average-hashing and costs no
    DCT — the standard cheap first pass before pHash verification in
    image-dedup stacks (both hashes feed the same Hamming-LSH banding
    as ``mm_phash_near_dup``).

    The grid is the documented deterministic decode stand-in
    (mm_decode_features:38 policy — no image codec in this container);
    the comparison/packing plumbing is the real production shape.

    Exactness: grid values and neighbor comparisons are integers; the
    packed hash is an exact sum of distinct powers of two.

    Scale: the whole comparison/packing folds IN-ROW over the 64-cell
    grid (``_let``-bound so the md5 grid evaluates once — the
    CollapseProject/lambda hazard documented there): a single narrow
    map-only projection, no explode, no self-join, no shuffle — at
    100 TB this is one pass over the stored grid column. The oracle
    states the equivalent neighbor self-join in SQL."""
    docs = load(spark, d, "documents").select(
        "doc_id", F.md5("text").alias("key")
    )
    vals_expr = F.transform(
        F.sequence(F.lit(0), F.lit(63)),
        lambda k: hash60(
            F.concat(F.col("key"), F.lit(":ph:"), k.cast("string"))
        )
        % 256,
    )
    # the 56 horizontal neighbor pairs: j = 7x + y (x 0..7, y 0..6);
    # bit j set iff grid[x][y+1] > grid[x][y], weight 1 << j
    def packed(vals):
        def cmp(j):
            x, y = (j / 7).cast("int"), (j % 7).cast("int")
            return F.element_at(vals, x * 8 + y + 2) > F.element_at(
                vals, x * 8 + y + 1
            )

        pairs = F.sequence(F.lit(0), F.lit(55))
        # bit weights as a literal array (shiftleft needs a Python-int
        # shift; a lambda variable can only index a constant table)
        w56 = F.array(*[F.lit(1 << j).cast("long") for j in range(56)])
        dhash = F.aggregate(
            pairs,
            F.lit(0).cast("long"),
            lambda acc, j: acc
            + F.when(cmp(j), F.element_at(w56, j.cast("int") + 1)).otherwise(
                F.lit(0).cast("long")
            ),
        )
        n_bits = F.aggregate(
            pairs,
            F.lit(0).cast("long"),
            lambda acc, j: acc
            + F.when(cmp(j), F.lit(1).cast("long")).otherwise(
                F.lit(0).cast("long")
            ),
        )
        return F.struct(dhash.alias("dhash"), n_bits.alias("n_bits_set"))

    res = _let(vals_expr, packed)
    return docs.select("doc_id", res.alias("r")).select(
        "doc_id",
        F.col("r")["dhash"].alias("dhash"),
        F.col("r")["n_bits_set"].alias("n_bits_set"),
    )


def _audio_dr_oracle() -> str:
    from pro_etl_spark.registry import ORACLES

    return f"""
    WITH fr AS ({ORACLES["mm_audio_energy"]}),
    fr2 AS (
      SELECT *,
             energy * COUNT(*) OVER (PARTITION BY doc_id)
               > SUM(energy) OVER (PARTITION BY doc_id) AS is_loud
      FROM fr
    )
    SELECT doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_frames,
           CAST(MAX(energy) AS BIGINT) AS e_max,
           CAST(MIN(energy) AS BIGINT) AS e_min,
           ROUND(CAST(MAX(energy) * COUNT(*) AS DOUBLE) / SUM(energy), 6)
             AS crest,
           CAST(SUM(CASE WHEN is_loud THEN 1 ELSE 0 END) AS BIGINT)
             AS n_loud,
           CAST(FLOOR(LN((MAX(energy) + 1.0) / (MIN(energy) + 1.0))
                      * 1000000.0) AS BIGINT) AS dyn_range_ln_micros
    FROM fr2 GROUP BY doc_id
    """


@register("mm_audio_dynamic_range", oracle=_audio_dr_oracle())
def mm_audio_dynamic_range(spark: SparkSession, d: str) -> DataFrame:
    """AUDIO DYNAMIC-RANGE / loudness QC per clip on the framed-energy
    front-end (``mm_audio_energy``): crest factor (peak-frame energy
    over mean — clipping and over-compression detector), loud-frame
    count (frames strictly above the clip mean, the integer
    cross-multiply trick so no division enters the comparison), and
    the log peak/floor ratio — the triage features an audio ingest
    runs to route clips to re-encode / discard / keep before any
    expensive transcription.

    Exactness: frame energies are exact integers; the mean comparison
    is an integer cross-multiply; ln is floor-quantized to micros; the
    one crest division is IEEE at 1e-6.

    Scale: pure map — every statistic is a fold over the document's
    own energies array (r12: the old shape exploded the frame table,
    shuffled it under a doc-keyed window for the loud flag and
    doc-keyed groupBy for the rollup — but all of a document's frames
    live in ONE source row, so the window, the aggregate and their
    exchanges were pure overhead; same integers, same IEEE ops)."""
    pcm = _audio_pcm()
    energies = _audio_energies()
    # nested _let bindings: es, then the scalar fold (nf/te/max/min),
    # are lambda VARIABLES — every downstream reference (including
    # inside the loud-frame filter lambda) reads the bound value, so
    # nothing re-evaluates per element or per reference
    row = _let(
        energies,
        lambda es: _let(
            F.struct(
                F.size(es).cast("long").alias("nf"),
                F.aggregate(
                    es, F.lit(0).cast("long"), lambda a, v: a + v
                ).alias("te"),
                F.array_max(es).cast("long").alias("emax"),
                F.array_min(es).cast("long").alias("emin"),
            ),
            lambda st: F.struct(
                st["nf"].alias("n_frames"),
                st["emax"].alias("e_max"),
                st["emin"].alias("e_min"),
                F.round(
                    (st["emax"] * st["nf"]).cast("double") / st["te"], 6
                ).alias("crest"),
                F.size(F.filter(es, lambda e: e * st["nf"] > st["te"]))
                .cast("long")
                .alias("n_loud"),
                F.floor(
                    F.log((st["emax"] + 1.0) / (st["emin"] + 1.0))
                    * 1000000.0
                )
                .cast("long")
                .alias("dyn_range_ln_micros"),
            ),
        ),
    )
    return (
        load(spark, d, "documents")
        .select("doc_id", pcm.alias("pcm"))
        .where(F.size("pcm") > 0)
        .select("doc_id", row.alias("r"))
        .select(
            "doc_id",
            F.col("r.n_frames").alias("n_frames"),
            F.col("r.e_max").alias("e_max"),
            F.col("r.e_min").alias("e_min"),
            F.col("r.crest").alias("crest"),
            F.col("r.n_loud").alias("n_loud"),
            F.col("r.dyn_range_ln_micros").alias("dyn_range_ln_micros"),
        )
    )
