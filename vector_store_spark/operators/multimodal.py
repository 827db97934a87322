"""Multimodal (image/audio/video) column plumbing for training-data pipelines.

Design: media are **opaque binary columns with typed metadata** — the schema a
100 TB multimodal corpus actually uses:

    asset: struct<doc_id bigint, modality string, content binary>
    decoded metadata: width/height/duration/frames as typed columns

Decode / resize / frame-sample run as Arrow-batched ``mapInPandas`` stages:
per-partition streaming over record batches, no shuffle, binary bytes never
leave the executor. Real codecs (PIL/ffmpeg/soundfile) are NOT in this
container, so the byte format here is a deterministic FAKE container
(``FAKE`` magic + big-endian u32 width/height + payload) and
``decode_real()`` raises NotImplementedError where a codec would plug in.
Everything Spark-side — schemas, UDF signatures, 1→N batch fan-out,
partition-pruning-friendly layout — is real and tested.

At scale: assets live in parquet partitioned by modality (queries prune whole
modalities); decode stages pipeline behind the scan; frame sampling fans out
rows inside each Arrow batch without shuffles.
"""

from __future__ import annotations

import struct
from typing import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MAGIC = b"FAKE"
HEADER_LEN = 12  # magic(4) + width u32 BE + height u32 BE
FRAME_BYTES = 256
AUDIO_RATE = 8000  # fake: 1-byte samples at 8 kHz

MODALITIES = ("image", "audio", "video")


def fake_dims(doc_id: int) -> tuple[int, int]:
    """Deterministic metadata embedded into the fake container header — the
    oracle re-derives these directly from doc_id, so a correctness PASS proves
    the bytes round-tripped through the binary column."""
    return 16 + doc_id % 48, 16 + (doc_id * 7) % 48


def decode_real(content: bytes) -> dict:
    """Where a real codec would plug in (PIL.Image.open / av.open /
    soundfile.read). Not available in this container."""
    raise NotImplementedError(
        "real media decoding requires PIL/av/soundfile; this environment ships "
        "the deterministic FAKE container instead (decode_meta)"
    )


def synth_assets(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """documents → (doc_id, modality, content binary): payload = utf-8 text,
    header = FAKE|width|height, modality = doc_id % 3. This is the test-fixture
    generator standing in for a real media crawl."""
    import pandas as pd

    def build(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = pdf[id_col].to_numpy()
            out = pd.DataFrame(
                {
                    "doc_id": ids,
                    "modality": [MODALITIES[i % 3] for i in ids],
                    "content": [
                        MAGIC
                        + struct.pack(">II", *fake_dims(int(i)))
                        + (t or "").encode("utf-8")
                        for i, t in zip(ids, pdf[text_col])
                    ],
                }
            )
            yield out

    return docs.select(id_col, text_col).mapInPandas(
        build, "doc_id long, modality string, content binary"
    )


DECODED_SCHEMA = (
    "doc_id long, modality string, width int, height int, "
    "payload_bytes long, duration_ms double, n_frames int, valid boolean"
)


def decode_meta(assets: DataFrame) -> DataFrame:
    """Decode stage: parse the container header into typed metadata columns.
    Corrupt/foreign blobs yield valid=false rows (never exceptions — at 100 TB
    a poison blob must not kill the job)."""
    import pandas as pd

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, modality, content in zip(
                pdf["doc_id"], pdf["modality"], pdf["content"]
            ):
                b = bytes(content) if content is not None else b""
                ok = len(b) >= HEADER_LEN and b[:4] == MAGIC
                if ok:
                    w, h = struct.unpack(">II", b[4:12])
                    n = len(b) - HEADER_LEN
                else:
                    w = h = n = 0
                rows.append(
                    {
                        "doc_id": doc_id,
                        "modality": modality,
                        "width": w if modality == "image" or not ok else 0,
                        "height": h if modality == "image" or not ok else 0,
                        "payload_bytes": n,
                        "duration_ms": (n * 1000.0 / AUDIO_RATE) if modality == "audio" else 0.0,
                        "n_frames": -(-n // FRAME_BYTES) if modality == "video" else 0,
                        "valid": ok,
                    }
                )
            yield pd.DataFrame(rows)

    return assets.mapInPandas(decode, DECODED_SCHEMA)


def resize_plan(decoded: DataFrame, box: int = 64) -> DataFrame:
    """Aspect-preserving fit-into-box resize targets for images — the metadata
    half of a resize stage (the pixel half is the stubbed codec). Integer math
    (floor) so both engines agree exactly."""
    w, h = F.col("width"), F.col("height")
    scale_num = F.lit(box)
    longest = F.greatest(w, h)
    new_w = F.floor(w * scale_num / longest).cast("int")
    new_h = F.floor(h * scale_num / longest).cast("int")
    return (
        decoded.where((F.col("modality") == "image") & F.col("valid"))
        .select(
            "doc_id", "width", "height",
            F.when(longest <= box, w).otherwise(new_w).alias("new_width"),
            F.when(longest <= box, h).otherwise(new_h).alias("new_height"),
        )
    )


def frame_sample(assets: DataFrame, every_n: int = 4) -> DataFrame:
    """Video frame sampling: 1→N fan-out inside each Arrow batch — one output
    row per sampled frame with its byte extent (a real pipeline would attach
    the decoded frame tensor; extents are what the shuffle/storage layer sees)."""
    import pandas as pd

    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, offs, lens = [], [], [], []
            for doc_id, modality, content in zip(
                pdf["doc_id"], pdf["modality"], pdf["content"]
            ):
                if modality != "video":
                    continue
                b = bytes(content)
                if len(b) < HEADER_LEN or b[:4] != MAGIC:
                    continue
                n = len(b) - HEADER_LEN
                n_frames = -(-n // FRAME_BYTES)
                for fi in range(0, n_frames, every_n):
                    ids.append(doc_id)
                    idxs.append(fi)
                    offs.append(HEADER_LEN + fi * FRAME_BYTES)
                    lens.append(min(FRAME_BYTES, n - fi * FRAME_BYTES))
            yield pd.DataFrame(
                {"doc_id": ids, "frame_idx": idxs, "byte_offset": offs, "frame_bytes": lens}
            )

    return assets.mapInPandas(
        sample, "doc_id long, frame_idx int, byte_offset long, frame_bytes int"
    )


def patch_grid(decoded: DataFrame, patch: int = 8) -> DataFrame:
    """ViT-style patch planning: one row per (doc, patch) with grid coords and
    actual patch extent (edge patches clip) — the tokenization step of an
    image encoder, as metadata (the pixel gather is the stubbed codec).
    Pure-Catalyst 1→N fan-out (explode over an index sequence), no shuffle."""
    w, h = F.col("width"), F.col("height")
    n_px = F.ceil(w / patch).cast("int")
    n_py = F.ceil(h / patch).cast("int")
    imgs = (
        decoded.where((F.col("modality") == "image") & F.col("valid"))
        .select("doc_id", "width", "height", n_px.alias("_npx"), n_py.alias("_npy"))
    )
    out = imgs.select(
        "doc_id", "width", "height", "_npx",
        F.explode(F.sequence(F.lit(0), F.col("_npx") * F.col("_npy") - 1)).alias("patch_id"),
    )
    px = F.col("patch_id") % F.col("_npx")
    py = (F.col("patch_id") / F.col("_npx")).cast("int")
    return out.select(
        "doc_id",
        F.col("patch_id").cast("long").alias("patch_id"),
        px.cast("long").alias("px"),
        py.cast("long").alias("py"),
        F.least(F.lit(patch), F.col("width") - px * patch).cast("long").alias("patch_w"),
        F.least(F.lit(patch), F.col("height") - py * patch).cast("long").alias("patch_h"),
    )


def audio_windows(decoded: DataFrame, window_ms: int = 250, hop_ms: int = 125) -> DataFrame:
    """Audio segmentation plan: fixed-duration windows with hop (the
    spectrogram/ASR framing step), from decoded metadata — 1→N explode per
    window with clipped end extents, no shuffle. Sample math uses the fake
    container's 1-byte samples at AUDIO_RATE."""
    if not 0 < hop_ms <= window_ms:
        raise ValueError("need 0 < hop_ms <= window_ms")
    dur = F.col("duration_ms")
    n_win = F.when(dur <= 0, F.lit(0)).otherwise(
        F.floor((dur - 1) / hop_ms) + 1
    ).cast("int")
    auds = (
        decoded.where((F.col("modality") == "audio") & F.col("valid"))
        .select("doc_id", dur.alias("_dur"), n_win.alias("_nw"))
        .where(F.col("_nw") > 0)
    )
    out = auds.select(
        "doc_id", "_dur",
        F.explode(F.sequence(F.lit(0), F.col("_nw") - 1)).alias("window_id"),
    )
    start = F.col("window_id") * hop_ms
    return out.select(
        "doc_id",
        F.col("window_id").cast("long").alias("window_id"),
        start.cast("double").alias("start_ms"),
        F.round(F.least(F.lit(float(window_ms)), F.col("_dur") - start), 6).alias("win_ms"),
    )
