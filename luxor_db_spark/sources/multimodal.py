"""Multimodal columns: binary payloads + typed metadata (BASELINE.json
mandate: "multimodal columns" for training-data pipelines).

Design (the part that must be real at 100 TB):
- media is an opaque ``binary`` column riding next to typed metadata;
- decode / feature-extract runs as Arrow-batched ``mapInPandas`` so bytes
  never round-trip through Python row objects;
- partitioning is by the metadata (never by payload), so planning stays
  cheap and payload bytes move at most once.

Decode is REAL when a codec library is importable: ``_decode_image`` opens
the payload with PIL (lazy header parse — no full pixel decode for
metadata) and only falls back to ``_stub_decode_image``, a clearly-marked
deterministic fake, when PIL is absent (this container) or the bytes are
not a decodable image (the text-byte fixture payloads). The Spark-side
plumbing (schema, batch iteration, UDF signature) is identical on both
paths and is what the tests pin down.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from luxor_db_spark.catalog import load_table
from luxor_db_spark.registry import query

_META_SCHEMA = (
    "doc_id long, n_bytes int, format string, width int, height int, "
    "sha_prefix string"
)


try:  # real codec path — not installed in this container
    from PIL import Image as _PILImage
    from PIL import UnidentifiedImageError as _PILError
except ImportError:  # pragma: no cover - container has no PIL
    _PILImage = None
    _PILError = Exception


def _stub_decode_image(payload: bytes) -> tuple[str, int, int]:
    """STUB standing in for a real image decoder when none is importable.

    Deterministic fake: derives (format, width, height) from an md5 of the
    payload bytes (NOT Python ``hash()``, whose per-process seed would make
    results differ across runs) so tests are stable across rounds.
    """
    import hashlib

    h = int.from_bytes(hashlib.md5(payload).digest()[:4], "big") & 0x7FFFFFFF
    fmt = ("png", "jpeg", "webp")[h % 3]
    return fmt, 64 + h % 1920, 64 + (h >> 11) % 1080


def _parse_image_header(payload: bytes) -> tuple[str, int, int] | None:
    """REAL header-only decode for PNG / GIF / JPEG — pure stdlib.

    This is the production fast path for metadata extraction regardless of
    codec availability: dimensions live in the first bytes (PNG IHDR, GIF
    logical screen descriptor, JPEG SOF segment), so a catalog pass never
    touches pixel data. Returns None for bytes that are not one of these
    container formats.
    """
    import struct

    if payload[:8] == b"\x89PNG\r\n\x1a\n" and payload[12:16] == b"IHDR":
        w, h = struct.unpack(">II", payload[16:24])
        return "png", w, h
    if payload[:6] in (b"GIF87a", b"GIF89a"):
        w, h = struct.unpack("<HH", payload[6:10])
        return "gif", w, h
    if payload[:2] == b"\xff\xd8":  # JPEG SOI; scan segments for SOFn
        i = 2
        while i + 9 < len(payload):
            if payload[i] != 0xFF:
                break
            marker = payload[i + 1]
            if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
                i += 2  # standalone markers carry no length
                continue
            (seglen,) = struct.unpack(">H", payload[i + 2 : i + 4])
            if 0xC0 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):
                h, w = struct.unpack(">HH", payload[i + 5 : i + 9])
                return "jpeg", w, h
            i += 2 + seglen
    return None


def _decode_image(payload: bytes) -> tuple[str, int, int]:
    """Image metadata decode: PIL lazy open when a codec library exists,
    else the stdlib header parser (real for PNG/GIF/JPEG), else the
    deterministic stub for undecodable bytes (e.g. text-byte payloads)."""
    if _PILImage is not None:
        import io

        try:
            with _PILImage.open(io.BytesIO(payload)) as im:
                return (im.format or "unknown").lower(), im.width, im.height
        except (_PILError, OSError):
            pass  # not an image (e.g. the text-byte fixture payloads)
    parsed = _parse_image_header(payload)
    if parsed is not None:
        return parsed
    return _stub_decode_image(payload)


def _decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Arrow-batched decode: one pandas frame per batch, payload stays bytes."""
    import hashlib

    for pdf in batches:
        fmts, ws, hs, shas = [], [], [], []
        for payload in pdf["media"]:
            fmt, w, h = _decode_image(payload)
            fmts.append(fmt)
            ws.append(w)
            hs.append(h)
            shas.append(hashlib.sha256(payload).hexdigest()[:16])
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "n_bytes": pdf["media"].map(len).astype("int32"),
                "format": fmts,
                "width": pd.Series(ws, dtype="int32"),
                "height": pd.Series(hs, dtype="int32"),
                "sha_prefix": shas,
            }
        )


# SQL mirror of _stub_decode_image's md5-derived geometry: parse the first
# 8 hex chars of md5(payload) into the same 32-bit big-endian value Python
# reads from digest()[:4], then mask to 31 bits.  Text payloads never carry
# PNG/GIF/JPEG magic bytes (asserted over the fixtures), so the stub branch
# is the one both engines compute.
_MD5_H31 = (
    "(("
    + " + ".join(
        f"(strpos('0123456789abcdef', substr(md5({{c}}), {i + 1}, 1)) - 1)"
        f" * {16 ** (7 - i)}"
        for i in range(8)
    )
    + ") % 2147483648)"
)


@query(
    "mm_decode_meta",
    oracle=f"""
    WITH h AS (
      SELECT doc_id, coalesce(text, '') AS t,
             {_MD5_H31.format(c="coalesce(text, '')")} AS hv
      FROM documents
    )
    SELECT doc_id,
           CAST(strlen(t) AS INT) AS n_bytes,
           CASE hv % 3 WHEN 0 THEN 'png' WHEN 1 THEN 'jpeg'
                ELSE 'webp' END AS format,
           CAST(64 + hv % 1920 AS INT) AS width,
           CAST(64 + (hv // 2048) % 1080 AS INT) AS height,
           substr(sha256(t), 1, 16) AS sha_prefix
    FROM h
    """,
)
def mm_decode_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary media column → typed metadata via mapInPandas.

    ``documents.text`` bytes stand in for media payloads (no binary fixture
    table exists); everything downstream of the payload column is the real
    multimodal pipeline shape. Oracle-checked: the stub decoder derives
    (format, width, height) from md5(payload) — reproduced symbolically in
    SQL (md5/sha256 over a varchar hash its utf-8 bytes in both engines),
    so a hash mismatch means the Arrow batch path corrupted payload bytes.
    """
    d = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        F.encode(F.coalesce(F.col("text"), F.lit("")), "utf-8").alias("media"),
    )
    return d.mapInPandas(_decode_batches, schema=_META_SCHEMA)


def make_png(width: int, height: int, rgb: tuple[int, int, int]) -> bytes:
    """Minimal valid RGB PNG, pure stdlib (zlib + struct) — the fixture
    generator for the real-decode path in codec-less environments."""
    import struct
    import zlib

    def chunk(typ: bytes, data: bytes) -> bytes:
        c = typ + data
        return struct.pack(">I", len(data)) + c + struct.pack(">I", zlib.crc32(c))

    ihdr = struct.pack(">IIBBBBB", width, height, 8, 2, 0, 0, 0)
    raw = b"".join(b"\x00" + bytes(rgb) * width for _ in range(height))
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


def make_gif(width: int, height: int) -> bytes:
    """Minimal GIF89a header + logical screen descriptor + trailer."""
    import struct

    return b"GIF89a" + struct.pack("<HH", width, height) + b"\x00\x00\x00;"


def _mm_dims(doc_id: int) -> tuple[int, int]:
    """Deterministic per-asset dimensions — mirrored in the SQL oracle."""
    return 16 + doc_id % 64, 16 + (doc_id * 7) % 64


def _synth_payload_batches(
    batches: Iterator[pd.DataFrame],
) -> Iterator[pd.DataFrame]:
    """Synthesize a real PNG (even doc_id) or GIF (odd) payload per row."""
    for pdf in batches:
        payloads = []
        for doc_id in pdf["doc_id"]:
            w, h = _mm_dims(int(doc_id))
            if doc_id % 2 == 0:
                payloads.append(make_png(w, h, (doc_id % 256, 10, 30)))
            else:
                payloads.append(make_gif(w, h))
        yield pd.DataFrame({"doc_id": pdf["doc_id"], "media": payloads})


@query(
    "mm_decode_image",
    oracle="""
    SELECT doc_id,
           CASE WHEN doc_id % 2 = 0 THEN 'png' ELSE 'gif' END AS format,
           CAST(16 + doc_id % 64 AS INT) AS width,
           CAST(16 + (doc_id * 7) % 64 AS INT) AS height
    FROM documents
    """,
)
def mm_decode_image(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL image decode, oracle-checked end to end: synthesize a valid
    PNG/GIF payload per document (dimensions derived from doc_id), then
    recover format/width/height from the *bytes* via the decode pipeline.
    The oracle recomputes the expected metadata symbolically from doc_id —
    a hash mismatch means the decoder misread actual image headers.

    Both stages are Arrow-batched mapInPandas over the metadata-partitioned
    catalog: payload bytes are created and consumed within one task, never
    shuffled — the exact shape a 100 TB ingest+probe pipeline needs.
    """
    d = load_table(spark, sf_dir, "documents").select("doc_id")
    with_media = d.mapInPandas(
        _synth_payload_batches, schema="doc_id long, media binary"
    )
    return with_media.mapInPandas(
        _decode_batches, schema=_META_SCHEMA
    ).select("doc_id", "format", "width", "height")


@query(
    "mm_meta_stats",
    oracle="""
    SELECT source, COUNT(*) AS n_assets,
           CAST(SUM(n_chars) AS BIGINT) AS total_bytes,
           CAST(MAX(n_chars) AS BIGINT) AS max_bytes
    FROM documents GROUP BY source
    """,
)
def mm_meta_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Typed-metadata aggregation over the asset catalog — the query pattern
    that must NEVER touch payload bytes (column pruning keeps the binary
    column out of the scan; verify via ReadSchema)."""
    d = load_table(spark, sf_dir, "documents")
    return d.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_assets"),
        F.sum("n_chars").cast("bigint").alias("total_bytes"),
        F.max("n_chars").cast("bigint").alias("max_bytes"),
    )


_RESIZE_SCHEMA = (
    "doc_id long, orig_w int, orig_h int, new_w int, new_h int, "
    "scale_e6 int, out_bytes int"
)

_TARGET_EDGE = 224  # standard vision-model input edge


def _resize_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Arrow-batched resize planning: compute target geometry per asset.

    The pixel work is stubbed (no codec libs here) — what's real is the
    contract a distributed resize must keep: pure per-row computation (no
    shuffle), bounded memory per batch, output size proportional to input
    count, payload bytes touched exactly once.
    """
    import math

    for pdf in batches:
        rows = []
        for doc_id, payload in zip(pdf["doc_id"], pdf["media"]):
            _, w, h = _decode_image(payload)
            scale = _TARGET_EDGE / min(w, h)
            # floor(x + 0.5), not round(): Python round() half-ties to even
            # while SQL dialects differ — floor is the one expression both
            # engines evaluate identically on IEEE doubles (the same recipe
            # as llm_embed_quantize). scale reports as micro-units (int) so
            # no raw double ever reaches the comparator hash.
            nw = math.floor(w * scale + 0.5)
            nh = math.floor(h * scale + 0.5)
            # STUB: a real impl emits re-encoded bytes; we emit the size a
            # deterministic 3-byte/px encode would produce.
            rows.append(
                (doc_id, w, h, nw, nh,
                 math.floor(scale * 1e6 + 0.5), nw * nh * 3)
            )
        yield pd.DataFrame(
            rows,
            columns=[
                "doc_id", "orig_w", "orig_h", "new_w", "new_h", "scale_e6",
                "out_bytes",
            ],
        )


@query(
    "mm_resize",
    oracle=f"""
    WITH h AS (
      SELECT doc_id, {_MD5_H31.format(c="coalesce(text, '')")} AS hv
      FROM documents
    ), g AS (
      SELECT doc_id,
             CAST(64 + hv % 1920 AS INT) AS w,
             CAST(64 + (hv // 2048) % 1080 AS INT) AS hh
      FROM h
    ), s AS (
      SELECT doc_id, w, hh, 224.0 / LEAST(w, hh) AS scale FROM g
    )
    SELECT doc_id, w AS orig_w, hh AS orig_h,
           CAST(FLOOR(w * scale + 0.5) AS INT) AS new_w,
           CAST(FLOOR(hh * scale + 0.5) AS INT) AS new_h,
           CAST(FLOOR(scale * 1000000.0 + 0.5) AS INT) AS scale_e6,
           CAST(FLOOR(w * scale + 0.5) * FLOOR(hh * scale + 0.5) * 3 AS INT)
             AS out_bytes
    FROM s
    """,
)
def mm_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shortest-edge-224 resize planning over binary assets via mapInPandas
    (the preprocessing step in front of any vision encoder).

    Oracle-checked end to end: geometry comes from the md5-derived stub
    dimensions (see `mm_decode_meta`), and every derived column is the
    FLOOR(x + 0.5) recipe on IEEE doubles — 224.0/min then per-edge
    multiply, the exact op order both engines execute.
    """
    d = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        F.encode(F.coalesce(F.col("text"), F.lit("")), "utf-8").alias("media"),
    )
    return d.mapInPandas(_resize_batches, schema=_RESIZE_SCHEMA)


@query(
    "mm_frame_sample",
    oracle="""
    SELECT doc_id, unnest(generate_series(0, CAST(n_chars AS INT) - 1, 1000))
           AS frame_idx
    FROM documents WHERE n_chars >= 1
    """,
)
def mm_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video frame sampling: emit every 1000th frame index per asset
    (n_chars stands in for the frame count read from container metadata).

    Pure JVM sequence+explode — sampling plans are computed without ever
    decoding video; only the sampled frames' byte ranges get fetched by the
    downstream decode stage. One row in → frames/1000 rows out, no shuffle.
    """
    d = load_table(spark, sf_dir, "documents").filter(F.col("n_chars") >= 1)
    return d.select(
        "doc_id",
        F.explode(
            F.sequence(
                F.lit(0), F.col("n_chars").cast("int") - 1, F.lit(1000)
            )
        ).alias("frame_idx"),
    )


@query(
    "mm_tile_plan",
    oracle="""
    WITH dims AS (
      SELECT doc_id,
             CAST(16 + doc_id % 64 AS INT) AS w,
             CAST(16 + (doc_id * 7) % 64 AS INT) AS h
      FROM documents
    ),
    g AS (
      SELECT doc_id, w, h,
             CAST((w + 13) // 14 AS INT) AS nx,
             CAST((h + 13) // 14 AS INT) AS ny
      FROM dims
    )
    SELECT doc_id,
           CAST(tx AS INT) AS tile_x, CAST(ty AS INT) AS tile_y,
           CAST(tx * 14 AS INT) AS x0,
           CAST(ty * 14 AS INT) AS y0,
           CAST(LEAST(14, w - tx * 14) AS INT) AS tile_w,
           CAST(LEAST(14, h - ty * 14) AS INT) AS tile_h
    FROM g,
         unnest(generate_series(0, nx - 1)) AS t1(tx),
         unnest(generate_series(0, ny - 1)) AS t2(ty)
    """,
)
def mm_tile_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vision-encoder tiling plan: split each asset's pixel grid into
    14×14 tiles (edge tiles clipped), emitting per-tile geometry — the
    patchification step in front of any ViT-style encoder, planned
    entirely from metadata (dimensions derive from doc_id exactly as
    `mm_decode_image` recovers them; no pixel data is touched).

    Scale shape: pure JVM sequence+explode — rows out = Σ tiles per
    asset, no shuffle; the downstream byte-fetch stage would read only
    each tile's byte range.
    """
    d = load_table(spark, sf_dir, "documents").select("doc_id")
    dims = d.select(
        "doc_id",
        (16 + F.col("doc_id") % 64).cast("int").alias("w"),
        (16 + (F.col("doc_id") * 7) % 64).cast("int").alias("h"),
    )
    g = dims.select(
        "doc_id",
        "w",
        "h",
        F.floor((F.col("w") + 13) / 14).cast("int").alias("nx"),
        F.floor((F.col("h") + 13) / 14).cast("int").alias("ny"),
    )
    tiled = g.select(
        "doc_id",
        "w",
        "h",
        F.explode(F.sequence(F.lit(0), F.col("nx") - 1)).alias("tile_x"),
        "ny",
    ).select(
        "doc_id",
        "w",
        "h",
        "tile_x",
        F.explode(F.sequence(F.lit(0), F.col("ny") - 1)).alias("tile_y"),
    )
    return tiled.select(
        "doc_id",
        F.col("tile_x").cast("int").alias("tile_x"),
        F.col("tile_y").cast("int").alias("tile_y"),
        (F.col("tile_x") * 14).cast("int").alias("x0"),
        (F.col("tile_y") * 14).cast("int").alias("y0"),
        F.least(F.lit(14), F.col("w") - F.col("tile_x") * 14)
        .cast("int")
        .alias("tile_w"),
        F.least(F.lit(14), F.col("h") - F.col("tile_y") * 14)
        .cast("int")
        .alias("tile_h"),
    )
