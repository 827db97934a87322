"""Multimodal registry entries. The Spark side round-trips real bytes —
synthesize container blobs, mapInPandas-decode them, aggregate typed metadata;
the oracle re-derives every value from doc_id/text alone. A PASS therefore
proves the binary encode→decode plumbing, not just the arithmetic.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from vector_store_spark.operators.multimodal import (
    AUDIO_RATE,
    FRAME_BYTES,
    HEADER_LEN,
    decode_meta,
    frame_sample,
    resize_plan,
    synth_assets,
)
from vector_store_spark.registry import ROUND, load, register

# oracle-side fake-container model (must mirror operators/multimodal exactly)
_MODALITY = "CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END"
_W = "16 + doc_id % 48"
_H = "16 + (doc_id * 7) % 48"
_PAYLOAD = "length(text)"  # ASCII corpus: chars == utf-8 bytes


@register(
    "mm_catalog",
    f"""
WITH a AS (
  SELECT doc_id, {_MODALITY} AS modality, {_PAYLOAD} AS payload FROM documents
)
SELECT modality,
       count(*) AS n_assets,
       CAST(sum(payload) AS BIGINT) AS total_payload_bytes,
       CAST(sum(CASE WHEN modality = 'video' THEN CAST(ceil(payload / {FRAME_BYTES}.0) AS INT) ELSE 0 END) AS BIGINT) AS total_frames,
       round(sum(CASE WHEN modality = 'audio' THEN payload * 1000.0 / {AUDIO_RATE} ELSE 0 END), {ROUND}) AS total_duration_ms
FROM a GROUP BY modality
""",
    "Multimodal catalog: binary assets decoded (mapInPandas) -> typed metadata rollup",
)
def mm_catalog(spark, sf_dir):
    docs = load(spark, sf_dir, "documents")
    decoded = decode_meta(synth_assets(docs))
    return (
        decoded.where("valid")
        .groupBy("modality")
        .agg(
            F.count("*").alias("n_assets"),
            F.sum("payload_bytes").alias("total_payload_bytes"),
            F.sum("n_frames").alias("total_frames"),
            F.round(F.sum("duration_ms"), ROUND).alias("total_duration_ms"),
        )
    )


@register(
    "mm_resize_plan",
    f"""
WITH img AS (
  SELECT doc_id, {_W} AS w, {_H} AS h FROM documents WHERE doc_id % 3 = 0
)
SELECT doc_id, w AS width, h AS height,
       CASE WHEN greatest(w, h) <= 32 THEN w
            ELSE CAST(floor(w * 32 / greatest(w, h)) AS INT) END AS new_width,
       CASE WHEN greatest(w, h) <= 32 THEN h
            ELSE CAST(floor(h * 32 / greatest(w, h)) AS INT) END AS new_height
FROM img
""",
    # box=32 sits INSIDE the synthesized dim range (16..63) so BOTH CASE
    # branches — pass-through and the aspect-fit floor arithmetic — are
    # exercised by the oracle (box=64 made every asset pass-through)
    "Image resize targets: decode header dims from bytes, aspect-fit into 32px box",
)
def mm_resize_plan(spark, sf_dir):
    docs = load(spark, sf_dir, "documents")
    return resize_plan(decode_meta(synth_assets(docs)), box=32)


@register(
    "mm_frame_sample",
    f"""
WITH v AS (
  SELECT doc_id, {_PAYLOAD} AS n,
         CAST(ceil({_PAYLOAD} / {FRAME_BYTES}.0) AS INT) AS n_frames
  FROM documents WHERE doc_id % 3 = 2
)
SELECT doc_id, CAST(fi AS INT) AS frame_idx,
       {HEADER_LEN} + fi * {FRAME_BYTES} AS byte_offset,
       CAST(least({FRAME_BYTES}, n - fi * {FRAME_BYTES}) AS INT) AS frame_bytes
FROM v, unnest(range(0, n_frames, 4)) AS t(fi)
""",
    "Video frame sampling: 1-to-N mapInPandas fan-out, every 4th frame's byte extent",
)
def mm_frame_sample(spark, sf_dir):
    docs = load(spark, sf_dir, "documents")
    return frame_sample(synth_assets(docs), every_n=4)


_PATCH = 8


@register(
    "mm_patch_grid",
    f"""
WITH a AS (
  SELECT doc_id, CAST({_W} AS INT) AS w, CAST({_H} AS INT) AS h
  FROM documents WHERE ({_MODALITY}) = 'image'
),
g AS (
  SELECT doc_id, w, h,
         CAST(ceil(w / {_PATCH}.0) AS INT) AS npx,
         CAST(ceil(h / {_PATCH}.0) AS INT) AS npy
  FROM a
),
p AS (
  SELECT doc_id, w, h, npx, unnest(range(0, npx * npy)) AS patch_id FROM g
)
SELECT doc_id,
       CAST(patch_id AS BIGINT) AS patch_id,
       CAST(patch_id % npx AS BIGINT) AS px,
       CAST(patch_id // npx AS BIGINT) AS py,
       CAST(least({_PATCH}, w - (patch_id % npx) * {_PATCH}) AS BIGINT) AS patch_w,
       CAST(least({_PATCH}, h - (patch_id // npx) * {_PATCH}) AS BIGINT) AS patch_h
FROM p
""",
    "ViT-style patch grid over decoded image dims: 1->N explode per patch "
    "with clipped edge extents (the image-tokenization plan, no shuffle)",
)
def mm_patch_grid(spark, sf_dir):
    from vector_store_spark.operators.multimodal import patch_grid

    docs = load(spark, sf_dir, "documents")
    decoded = decode_meta(synth_assets(docs))
    return patch_grid(decoded, patch=_PATCH)


_WIN_MS, _HOP_MS = 250, 125


@register(
    "mm_audio_windows",
    f"""
WITH a AS (
  SELECT doc_id, {_PAYLOAD} * 1000.0 / {AUDIO_RATE} AS dur
  FROM documents WHERE ({_MODALITY}) = 'audio' AND {_PAYLOAD} > 0
),
w AS (
  SELECT doc_id, dur,
         unnest(range(0, CAST(floor((dur - 1) / {_HOP_MS}) AS BIGINT) + 1)) AS window_id
  FROM a
)
SELECT doc_id, CAST(window_id AS BIGINT) AS window_id,
       CAST(window_id * {_HOP_MS} AS DOUBLE) AS start_ms,
       round(least({_WIN_MS}.0, dur - window_id * {_HOP_MS}), 6) AS win_ms
FROM w
""",
    "Audio segmentation plan: 250ms windows / 125ms hop from decoded "
    "duration metadata (the ASR/spectrogram framing step), 1->N explode",
)
def mm_audio_windows(spark, sf_dir):
    from vector_store_spark.operators.multimodal import audio_windows

    docs = load(spark, sf_dir, "documents")
    decoded = decode_meta(synth_assets(docs))
    return audio_windows(decoded, window_ms=_WIN_MS, hop_ms=_HOP_MS)


@register(
    "mm_decode_real_roundtrip",
    # REAL-codec leg (not the FAKE container): even doc_ids are encoded as
    # actual 24-bit BMPs (row stride padded to 4 bytes — the format's real
    # rule), odd doc_ids as 16-bit PCM WAVs written by the stdlib `wave`
    # module (44-byte RIFF header + 2 bytes/sample). The Spark side DECODES
    # the real headers; the oracle re-derives every rollup value from doc_id
    # through the same public-format arithmetic, so a PASS proves the
    # encode→decode codec plumbing end to end. Analogue: the reference's
    # dual blob-tag vector decode (vector.rs:62-129).
    f"""
WITH m AS (
  SELECT doc_id,
         CASE WHEN doc_id % 2 = 0 THEN 'image' ELSE 'audio' END AS modality,
         16 + doc_id % 48 AS w,
         16 + (doc_id * 7) % 48 AS h,
         400 + (doc_id * 13) % 800 AS ns
  FROM documents
)
SELECT modality,
       count(*) AS n_assets,
       CAST(sum(CASE WHEN modality = 'image' THEN w * h ELSE 0 END) AS BIGINT) AS total_pixels,
       CAST(sum(CASE WHEN modality = 'audio' THEN ns ELSE 0 END) AS BIGINT) AS total_samples,
       round(sum(CASE WHEN modality = 'audio' THEN ns * 1000.0 / 8000 ELSE 0 END), {ROUND}) AS total_duration_ms,
       CAST(sum(CASE WHEN modality = 'image'
                     THEN 54 + ((3 * w + 3) // 4) * 4 * h
                     ELSE 44 + 2 * ns END) AS BIGINT) AS total_bytes
FROM m GROUP BY modality
""",
    "Real-codec round-trip: stdlib-encoded BMP/WAV assets decoded by REAL "
    "header parsing (struct + wave) into typed metadata rollups — the "
    "working leg of the decode_real plug-point",
)
def mm_decode_real_roundtrip(spark, sf_dir):
    from vector_store_spark.operators.multimodal import (
        decode_real_meta,
        synth_real_assets,
    )

    docs = load(spark, sf_dir, "documents")
    decoded = decode_real_meta(synth_real_assets(docs))
    return (
        decoded.where("valid")
        .groupBy("modality")
        .agg(
            F.count("*").alias("n_assets"),
            F.sum(F.col("width").cast("long") * F.col("height")).alias("total_pixels"),
            F.sum("n_samples").alias("total_samples"),
            F.round(F.sum("duration_ms"), ROUND).alias("total_duration_ms"),
            F.sum("payload_bytes").alias("total_bytes"),
        )
    )


@register(
    "mm_decode_png_roundtrip",
    # PNG leg of the real-codec pillar: stdlib-zlib-encoded 8-bit RGB
    # PNGs (level-0 stored deflate => file size is pure arithmetic; rows
    # cycle ALL FIVE filter types None/Sub/Up/Average/Paeth — every image
    # here is >= 16 rows so every filter is exercised, incl. the Paeth
    # reconstruction scan). The oracle re-derives every rollup from doc_id:
    #   file_bytes = 68 + h + 3*w*h   (sig 8 + IHDR 25 + IDAT framing 12 +
    #     zlib 2 + one stored-block header 5 (scanlines < 64 KiB at these
    #     dims) + h*(1+3w) raw + adler 4 + IEND 12)
    #   pixel_sum  = closed form of sum_i (doc_id + i) % 256 over 3*w*h
    #     ramp bytes (full 256-cycles contribute 32640 each; the remainder
    #     splits at the wrap point)
    # A PASS proves encode -> chunk walk -> CRC check -> inflate ->
    # de-filter -> pixel arithmetic end to end.
    """
WITH img AS (
  SELECT doc_id,
         16 + doc_id % 48 AS w,
         16 + (doc_id * 7) % 48 AS h,
         doc_id % 256 AS s
  FROM documents WHERE doc_id % 4 = 0
),
x AS (
  SELECT doc_id, w, h, s, 3 * w * h AS npx FROM img
),
y AS (
  SELECT doc_id, w, h,
         68 + h + 3 * w * h AS file_bytes,
         (npx // 256) * 32640 +
         CASE WHEN npx % 256 = 0 THEN 0
              WHEN s + (npx % 256) <= 256
                THEN (npx % 256) * s + (npx % 256) * ((npx % 256) - 1) // 2
              ELSE (256 - s) * s + (256 - s) * (255 - s) // 2
                   + ((npx % 256) - 256 + s) * ((npx % 256) - 257 + s) // 2
         END AS pixel_sum
  FROM x
)
SELECT count(*) AS n_assets,
       CAST(sum(w * h) AS BIGINT) AS total_pixels,
       CAST(sum(file_bytes) AS BIGINT) AS total_bytes,
       CAST(sum(pixel_sum) AS BIGINT) AS total_pixel_sum
FROM y
""",
    "Real-PNG round-trip: stdlib-zlib encoded 8-bit RGB PNGs (stored "
    "deflate, None/Sub/Up row filters) fully DECODED Spark-side — CRC "
    "verify, inflate, de-filter, pixel-byte sum — with every rollup "
    "re-derived by the oracle from doc_id arithmetic",
)
def mm_decode_png_roundtrip(spark, sf_dir):
    from vector_store_spark.operators.multimodal import (
        decode_png_meta,
        synth_png_assets,
    )

    docs = load(spark, sf_dir, "documents").where(F.col("doc_id") % 4 == 0)
    decoded = decode_png_meta(synth_png_assets(docs))
    return decoded.where("valid").agg(
        F.count("*").alias("n_assets"),
        F.sum(F.col("width").cast("long") * F.col("height")).alias("total_pixels"),
        F.sum("payload_bytes").alias("total_bytes"),
        F.sum("pixel_sum").alias("total_pixel_sum"),
    )


@register(
    "mm_decode_png_z9_roundtrip",
    # Same pixel arithmetic as mm_decode_png_roundtrip but zlib LEVEL 9 —
    # the stream is genuinely compressed (dynamic-Huffman deflate, like a
    # real encoder's output), so file size is NOT oracle-derivable and the
    # entry pins the pixel path only; a separate engine-side guard asserts
    # every payload came in strictly below its stored-block size.
    """
WITH img AS (
  SELECT doc_id,
         16 + doc_id % 48 AS w,
         16 + (doc_id * 7) % 48 AS h,
         doc_id % 256 AS s
  FROM documents WHERE doc_id % 8 = 2
),
x AS (
  SELECT doc_id, w, h, s, 3 * w * h AS npx FROM img
),
y AS (
  SELECT doc_id, w, h,
         (npx // 256) * 32640 +
         CASE WHEN npx % 256 = 0 THEN 0
              WHEN s + (npx % 256) <= 256
                THEN (npx % 256) * s + (npx % 256) * ((npx % 256) - 1) // 2
              ELSE (256 - s) * s + (256 - s) * (255 - s) // 2
                   + ((npx % 256) - 256 + s) * ((npx % 256) - 257 + s) // 2
         END AS pixel_sum
  FROM x
)
SELECT count(*) AS n_assets,
       CAST(sum(w * h) AS BIGINT) AS total_pixels,
       CAST(sum(pixel_sum) AS BIGINT) AS total_pixel_sum
FROM y
""",
    "Level-9 PNG round-trip: genuinely deflate-compressed 8-bit RGB streams "
    "(all five row filters) fully decoded Spark-side; pixel sums re-derived "
    "by the oracle, compression verified engine-side (payload < stored size)",
)
def mm_decode_png_z9_roundtrip(spark, sf_dir):
    from vector_store_spark.operators.multimodal import (
        decode_png_meta,
        synth_png_assets,
    )

    docs = load(spark, sf_dir, "documents").where(F.col("doc_id") % 8 == 2)
    decoded = decode_png_meta(synth_png_assets(docs, level=9))
    # compression guard: level 9 must beat the stored-block arithmetic size
    # (68 + h + 3wh) on every asset — folded in as a filter so a regression
    # to stored blocks would drop rows and fail the count
    stored = 68 + F.col("height") + 3 * F.col("width") * F.col("height")
    return (
        decoded.where("valid").where(F.col("payload_bytes") < stored)
        .agg(
            F.count("*").alias("n_assets"),
            F.sum(F.col("width").cast("long") * F.col("height")).alias("total_pixels"),
            F.sum("pixel_sum").alias("total_pixel_sum"),
        )
    )


@register(
    "mm_resize_plan_real",
    # the REAL-codec leg feeding a downstream op: decode actual BMP headers
    # (struct parse of bytes a real encoder wrote), then the same
    # aspect-fit-into-64px integer arithmetic as mm_resize_plan
    f"""
WITH img AS (
  SELECT doc_id, {_W} AS w, {_H} AS h FROM documents WHERE doc_id % 2 = 0
)
SELECT doc_id, w AS width, h AS height,
       CASE WHEN greatest(w, h) <= 32 THEN w
            ELSE CAST(floor(w * 32 / greatest(w, h)) AS INT) END AS new_width,
       CASE WHEN greatest(w, h) <= 32 THEN h
            ELSE CAST(floor(h * 32 / greatest(w, h)) AS INT) END AS new_height
FROM img
""",
    # box=32 (inside the 16..63 dim range) so the oracle validates BOTH the
    # pass-through and the aspect-fit floor branch of the real-codec leg
    "Resize targets from REAL decoded BMP headers (stdlib codec leg chained "
    "into the resize stage)",
)
def mm_resize_plan_real(spark, sf_dir):
    from vector_store_spark.operators.multimodal import (
        decode_real_meta,
        synth_real_assets,
    )

    docs = load(spark, sf_dir, "documents")
    return resize_plan(decode_real_meta(synth_real_assets(docs)), box=32)
