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


# ---------------------------------------------------------------------------
# Real-codec leg: two PUBLIC container formats with pure-stdlib codecs —
# 24-bit BMP (BITMAPINFOHEADER) for images and PCM WAV (RIFF, via the
# stdlib `wave` module) for audio. This is the working half of the
# `decode_real` plug-point: bytes are ENCODED by a real writer and DECODED
# by parsing the real header, so a round-trip PASS proves the codec leg,
# not just arithmetic. Formats beyond these two still raise (PIL/av live
# outside this container). Analogue: the reference decodes BOTH blob tags
# of its vector column (crates/vector-store/src/vector.rs:62-129).
# ---------------------------------------------------------------------------

WAV_RATE = 8000  # PCM sample rate for the synthesized assets (16-bit mono)
_BMP_HEADER = 54  # BITMAPFILEHEADER(14) + BITMAPINFOHEADER(40)


def bmp_row_bytes(width: int) -> int:
    """BMP rows are padded to 4-byte boundaries (the format's real rule —
    the oracle re-derives file sizes through this same arithmetic)."""
    return ((3 * width + 3) // 4) * 4


def encode_bmp(width: int, height: int, seed: int = 0) -> bytes:
    """A real, openable 24-bit BMP with deterministic pixel bytes."""
    row = bmp_row_bytes(width)
    img_size = row * height
    file_size = _BMP_HEADER + img_size
    header = (
        b"BM"
        + struct.pack("<IHHI", file_size, 0, 0, _BMP_HEADER)
        + struct.pack("<IiiHHIIiiII", 40, width, height, 1, 24, 0, img_size,
                      2835, 2835, 0, 0)
    )
    px = bytes((seed + i) % 256 for i in range(img_size))
    return header + px


def encode_wav(n_samples: int, seed: int = 0, rate: int = WAV_RATE) -> bytes:
    """A real PCM WAV (16-bit mono) written by the stdlib `wave` module."""
    import io
    import wave

    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(rate)
        w.writeframes(
            b"".join(
                struct.pack("<h", ((seed + 37 * i) % 2048) - 1024)
                for i in range(n_samples)
            )
        )
    return buf.getvalue()


def decode_real(content: bytes) -> dict:
    """Parse a REAL container header into typed metadata. Supported: 24-bit
    BMP (by header parse), 8-bit PNG (full stdlib-zlib decode — see
    :func:`decode_png`), and PCM WAV (by the stdlib `wave` reader). Other
    formats raise NotImplementedError — that is where PIL/av would plug in."""
    b = bytes(content) if content is not None else b""
    if len(b) >= _BMP_HEADER and b[:2] == b"BM":
        width, height = struct.unpack("<ii", b[18:26])
        bpp = struct.unpack("<H", b[28:30])[0]
        return {
            "modality": "image",
            "width": width,
            "height": abs(height),  # negative height = top-down row order
            "bits_per_pixel": bpp,
            "payload_bytes": len(b),
        }
    if len(b) >= 8 and b[:8] == _PNG_SIG:
        return decode_png(b)
    if len(b) >= 12 and b[:4] == b"RIFF" and b[8:12] == b"WAVE":
        import io
        import wave

        with wave.open(io.BytesIO(b), "rb") as w:
            n = w.getnframes()
            rate = w.getframerate()
            return {
                "modality": "audio",
                "n_samples": n,
                "sample_rate": rate,
                "n_channels": w.getnchannels(),
                "duration_ms": n * 1000.0 / rate,
                "payload_bytes": len(b),
            }
    raise NotImplementedError(
        "unsupported container (have BMP + WAV stdlib codecs; PIL/av formats "
        "require libraries outside this environment)"
    )


def wav_samples(doc_id: int) -> int:
    """Deterministic sample count for the synthesized WAV assets — the oracle
    re-derives duration/file size from doc_id through this same function."""
    return 400 + (doc_id * 13) % 800


# ---------------------------------------------------------------------------
# PNG codec (stdlib-only: zlib + the public PNG spec, RFC 2083) — the most
# common real-world image container a data pipeline meets. Encoder writes
# 8-bit RGB; at the default level-0 (stored-block) deflate the FILE SIZE
# stays pure doc_id arithmetic for the oracle; rows cycle ALL FIVE filter
# types 0-4 (None/Sub/Up/Average/Paeth), so decoding requires real
# de-filter reconstruction — including the Paeth predictor libpng's default
# heuristic emits on virtually every photographic image. The decoder is
# ingest-grade over the 8-bit subset: any filter, any deflate level.
# ---------------------------------------------------------------------------

_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _paeth_predictor(left, up, upleft):
    """RFC 2083 §6.6 Paeth: the neighbor closest to p = left + up − upleft,
    ties broken left → up → upleft. Vectorized over int64 arrays."""
    import numpy as np

    p = left + up - upleft
    pa = np.abs(p - left)
    pb = np.abs(p - up)
    pc = np.abs(p - upleft)
    return np.where(
        (pa <= pb) & (pa <= pc), left, np.where(pb <= pc, up, upleft)
    )


def _png_chunk(typ: bytes, data: bytes) -> bytes:
    import zlib

    return (
        struct.pack(">I", len(data)) + typ + data
        + struct.pack(">I", zlib.crc32(typ + data) & 0xFFFFFFFF)
    )


def png_scanline_len(width: int, height: int) -> int:
    """Raw pre-compression IDAT payload: 1 filter byte + 3·width RGB bytes
    per row."""
    return height * (1 + 3 * width)


def png_file_bytes(width: int, height: int) -> int:
    """Total encoded size through stored-deflate arithmetic: zlib level 0
    emits 2-byte header + 5 bytes per stored block (<= 65535 raw bytes each)
    + raw bytes + 4-byte adler32. The oracle re-derives file sizes through
    this same formula (mm_decode_png_roundtrip)."""
    n = png_scanline_len(width, height)
    idat = 2 + 5 * ((n + 65534) // 65535) + n + 4
    # 8 signature + 25 IHDR chunk (12 framing + 13 data) + IDAT framing + IEND
    return 8 + 25 + 12 + idat + 12


def encode_png(width: int, height: int, seed: int = 0, level: int = 0) -> bytes:
    """A real, decodable 8-bit RGB PNG. Pixels are the same deterministic
    (seed + i) % 256 byte ramp as :func:`encode_bmp` (row-major, no
    padding); row r is written with filter type r % 5 — all five RFC 2083
    filters (None/Sub/Up/Average/Paeth). ``level`` is the zlib level: the
    default 0 (stored blocks) keeps the file size pure arithmetic for the
    oracle; level 9 produces real-encoder-shaped compressed streams.

    Filtering an original image only ever references ORIGINAL neighbor
    bytes (reconstruction is lossless, so recon == original), which keeps
    every encoder filter fully vectorized — the sequential scan lives only
    in the decoder's Average/Paeth reconstruction."""
    import zlib

    import numpy as np

    stride = 3 * width
    px = (
        (seed + np.arange(stride * height, dtype=np.int64)) % 256
    ).astype(np.int64).reshape(height, stride)
    parts = []
    zero = np.zeros(stride, dtype=np.int64)
    for r in range(height):
        row = px[r]
        prev = px[r - 1] if r > 0 else zero
        left = np.concatenate([zero[:3], row[:-3]])  # bpp = 3 bytes
        upleft = np.concatenate([zero[:3], prev[:-3]])
        f = r % 5
        if f == 0:  # None
            enc = row
        elif f == 1:  # Sub: x − left
            enc = (row - left) % 256
        elif f == 2:  # Up: x − prior row
            enc = (row - prev) % 256
        elif f == 3:  # Average: x − floor((left + up) / 2)
            enc = (row - (left + prev) // 2) % 256
        else:  # Paeth: x − predictor(left, up, upleft)
            enc = (row - _paeth_predictor(left, prev, upleft)) % 256
        parts.append(bytes([f]) + enc.astype(np.uint8).tobytes())
    ihdr = struct.pack(">IIBBBBB", width, height, 8, 2, 0, 0, 0)
    idat = zlib.compress(b"".join(parts), level)
    return (
        _PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", idat)
        + _png_chunk(b"IEND", b"")
    )


def encode_png_paletted(width: int, height: int, seed: int = 0,
                        level: int = 0) -> bytes:
    """A real, decodable 8-bit PALETTED PNG (color type 3 + PLTE). Palette
    entry k is the deterministic RGB ((7k) % 256, (11k + 3) % 256,
    (13k + 5) % 256); pixel indices are the same (seed + i) % 256 ramp as
    :func:`encode_png`. Rows cycle all five filters over the 1-byte-per-
    pixel index plane (bpp = 1 for filtering, per RFC 2083)."""
    import zlib

    import numpy as np

    px = ((seed + np.arange(width * height, dtype=np.int64)) % 256
          ).reshape(height, width)
    parts = []
    zero = np.zeros(width, dtype=np.int64)
    for r in range(height):
        row = px[r]
        prev = px[r - 1] if r > 0 else zero
        left = np.concatenate([zero[:1], row[:-1]])  # bpp = 1 byte
        upleft = np.concatenate([zero[:1], prev[:-1]])
        f = r % 5
        if f == 0:
            enc = row
        elif f == 1:
            enc = (row - left) % 256
        elif f == 2:
            enc = (row - prev) % 256
        elif f == 3:
            enc = (row - (left + prev) // 2) % 256
        else:
            enc = (row - _paeth_predictor(left, prev, upleft)) % 256
        parts.append(bytes([f]) + enc.astype(np.uint8).tobytes())
    plte = bytes(
        v for k in range(256)
        for v in ((7 * k) % 256, (11 * k + 3) % 256, (13 * k + 5) % 256)
    )
    ihdr = struct.pack(">IIBBBBB", width, height, 8, 3, 0, 0, 0)
    idat = zlib.compress(b"".join(parts), level)
    return (
        _PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"PLTE", plte)
        + _png_chunk(b"IDAT", idat)
        + _png_chunk(b"IEND", b"")
    )


def decode_png(content: bytes) -> dict:
    """Parse + fully decode a PNG: chunk walk with CRC verification, IDAT
    inflate, per-row de-filter over ALL FIVE RFC 2083 filter types —
    None/Sub/Up vectorized, Average/Paeth via the per-pixel reconstruction
    scan their left-neighbor dependency requires (the byte lanes of one
    pixel stay vectorized). Returns typed metadata plus ``pixel_sum`` — the
    sum of every reconstructed pixel byte, which proves the
    inflate+de-filter path end to end (a header-only parse could not
    produce it)."""
    import zlib

    import numpy as np

    b = bytes(content)
    if b[:8] != _PNG_SIG:
        raise ValueError("not a PNG (bad signature)")
    pos = 8
    width = height = bit_depth = color_type = None
    interlace = 0
    plte = None
    idat = bytearray()
    while pos + 12 <= len(b):
        (ln,) = struct.unpack(">I", b[pos:pos + 4])
        typ = b[pos + 4:pos + 8]
        data = b[pos + 8:pos + 8 + ln]
        if len(data) != ln or pos + 12 + ln > len(b):
            raise ValueError("truncated chunk")
        (crc,) = struct.unpack(">I", b[pos + 8 + ln:pos + 12 + ln])
        if zlib.crc32(typ + data) & 0xFFFFFFFF != crc:
            raise ValueError(f"bad CRC in {typ!r}")
        if typ == b"IHDR":
            (width, height, bit_depth, color_type, compression, filter_method,
             interlace) = struct.unpack(">IIBBBBB", data[:13])
            if compression != 0 or filter_method != 0:
                raise ValueError(
                    f"invalid IHDR: compression={compression} "
                    f"filter_method={filter_method} (must be 0)")
            if interlace == 1:
                # EXPLICIT reject (was: an incidental IDAT-size mismatch):
                # Adam7 re-orders scanlines into 7 sub-images — a different
                # reconstruction walk this ingest decoder does not implement
                raise ValueError("Adam7 interlaced PNG not supported")
            if interlace != 0:
                raise ValueError(f"invalid interlace method {interlace}")
        elif typ == b"PLTE":
            if ln % 3 or ln > 768:
                raise ValueError("invalid PLTE length")
            plte = data
        elif typ == b"IDAT":
            idat.extend(data)
        elif typ == b"IEND":
            break
        pos += 12 + ln
    if width is None:
        raise ValueError("no IHDR")
    if not idat:
        raise ValueError("truncated PNG: no IDAT data")
    channels = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}[color_type]
    if bit_depth != 8:
        raise NotImplementedError("only 8-bit PNG supported")
    if color_type == 3 and plte is None:
        raise ValueError("paletted PNG (color type 3) without PLTE chunk")
    raw = np.frombuffer(zlib.decompress(bytes(idat)), dtype=np.uint8)
    stride = channels * width
    if len(raw) != height * (1 + stride):
        raise ValueError("IDAT size mismatch")
    rows = raw.reshape(height, 1 + stride)
    palette = None
    if color_type == 3:
        # PLTE expansion: reconstructed bytes are palette INDICES; the
        # pixel_sum covers the EXPANDED RGB bytes (what a consumer sees)
        palette = np.frombuffer(plte, dtype=np.uint8).reshape(-1, 3).astype(np.int64)
    total = 0
    prev = np.zeros(stride, dtype=np.int64)
    for r in range(height):
        f = int(rows[r, 0])
        row = rows[r, 1:].astype(np.int64)
        if f == 0:  # None
            recon = row
        elif f == 1:  # Sub: cumulative sum down each pixel-byte lane
            recon = np.cumsum(row.reshape(width, channels), axis=0).reshape(-1) % 256
        elif f == 2:  # Up
            recon = (row + prev) % 256
        elif f == 3:  # Average: left is RECONSTRUCTED — per-byte scan.
            # Plain-int lane math: tiny-array numpy ops cost ~µs each, so a
            # per-pixel numpy loop is 10x slower than this list scan.
            raw_l = row.tolist()
            prev_l = prev.tolist()
            cur = [0] * stride
            for x in range(stride):
                left = cur[x - channels] if x >= channels else 0
                cur[x] = (raw_l[x] + ((left + prev_l[x]) >> 1)) & 255
            recon = np.asarray(cur, dtype=np.int64)
        elif f == 4:  # Paeth: predictor over reconstructed neighbors
            raw_l = row.tolist()
            prev_l = prev.tolist()
            cur = [0] * stride
            for x in range(stride):
                left = cur[x - channels] if x >= channels else 0
                up = prev_l[x]
                ul = prev_l[x - channels] if x >= channels else 0
                p = left + up - ul
                pa = p - left if p >= left else left - p
                pb = p - up if p >= up else up - p
                pc = p - ul if p >= ul else ul - p
                pred = left if (pa <= pb and pa <= pc) else (up if pb <= pc else ul)
                cur[x] = (raw_l[x] + pred) & 255
            recon = np.asarray(cur, dtype=np.int64)
        else:
            raise ValueError(f"invalid PNG filter type {f}")
        if palette is not None:
            if recon.max(initial=0) >= len(palette):
                raise ValueError("palette index out of range")
            total += int(palette[recon].sum())
        else:
            total += int(recon.sum())
        prev = recon
    return {
        "modality": "image",
        "width": int(width),
        "height": int(height),
        # paletted pixels expand to RGB — report the consumer-visible depth
        "bits_per_pixel": 24 if palette is not None else 8 * channels,
        "payload_bytes": len(b),
        "pixel_sum": total,
    }


def synth_real_assets(
    docs: DataFrame, id_col: str = "doc_id"
) -> DataFrame:
    """documents → (doc_id, content binary) REAL containers: even doc_ids get
    a 24-bit BMP sized by :func:`fake_dims`, odd doc_ids a 16-bit PCM WAV of
    :func:`wav_samples` samples. Same Arrow-batched shape as
    :func:`synth_assets`; the bytes are real-format, stdlib-decodable."""
    import pandas as pd

    def build(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = pdf[id_col].to_numpy()
            out = pd.DataFrame(
                {
                    "doc_id": ids,
                    "content": [
                        encode_bmp(*fake_dims(int(i)), seed=int(i))
                        if i % 2 == 0
                        else encode_wav(wav_samples(int(i)), seed=int(i))
                        for i in ids
                    ],
                }
            )
            yield out

    return docs.select(id_col).mapInPandas(build, "doc_id long, content binary")


REAL_DECODED_SCHEMA = (
    "doc_id long, modality string, width int, height int, n_samples long, "
    "sample_rate int, duration_ms double, payload_bytes long, valid boolean"
)


def decode_real_meta(assets: DataFrame) -> DataFrame:
    """Decode stage over REAL containers (:func:`decode_real` per row,
    Arrow-batched). Undecodable blobs yield valid=false rows, never
    exceptions — the poison-blob rule of :func:`decode_meta` applies to the
    real leg too."""
    import pandas as pd

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, content in zip(pdf["doc_id"], pdf["content"]):
                try:
                    m = decode_real(content)
                except Exception:
                    rows.append({
                        "doc_id": doc_id, "modality": "unknown", "width": 0,
                        "height": 0, "n_samples": 0, "sample_rate": 0,
                        "duration_ms": 0.0, "payload_bytes": 0, "valid": False,
                    })
                    continue
                rows.append({
                    "doc_id": doc_id,
                    "modality": m["modality"],
                    "width": m.get("width", 0),
                    "height": m.get("height", 0),
                    "n_samples": m.get("n_samples", 0),
                    "sample_rate": m.get("sample_rate", 0),
                    "duration_ms": m.get("duration_ms", 0.0),
                    "payload_bytes": m["payload_bytes"],
                    "valid": True,
                })
            yield pd.DataFrame(rows)

    return assets.mapInPandas(decode, REAL_DECODED_SCHEMA)


def synth_png_assets(docs: DataFrame, id_col: str = "doc_id",
                     level: int = 0) -> DataFrame:
    """documents → (doc_id, content binary) real PNG containers sized by
    :func:`fake_dims`, pixel ramp seeded by doc_id — same Arrow-batched
    shape as :func:`synth_real_assets`. ``level`` is the zlib level (0 keeps
    file sizes arithmetic; 9 shapes the stream like a real encoder's)."""
    import pandas as pd

    def build(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = pdf[id_col].to_numpy()
            yield pd.DataFrame({
                "doc_id": ids,
                "content": [
                    encode_png(*fake_dims(int(i)), seed=int(i), level=level)
                    for i in ids
                ],
            })

    return docs.select(id_col).mapInPandas(build, "doc_id long, content binary")


PNG_DECODED_SCHEMA = (
    "doc_id long, width int, height int, bits_per_pixel int, "
    "payload_bytes long, pixel_sum long, valid boolean"
)


def decode_png_meta(assets: DataFrame) -> DataFrame:
    """Full-decode stage over PNG containers (:func:`decode_png` per row,
    Arrow-batched): typed metadata PLUS the reconstructed pixel-byte sum.
    Undecodable blobs yield valid=false rows (poison-blob rule)."""
    import pandas as pd

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, content in zip(pdf["doc_id"], pdf["content"]):
                try:
                    m = decode_png(content)
                    rows.append({
                        "doc_id": doc_id, "width": m["width"],
                        "height": m["height"],
                        "bits_per_pixel": m["bits_per_pixel"],
                        "payload_bytes": m["payload_bytes"],
                        "pixel_sum": m["pixel_sum"], "valid": True,
                    })
                except Exception:
                    rows.append({
                        "doc_id": doc_id, "width": 0, "height": 0,
                        "bits_per_pixel": 0, "payload_bytes": 0,
                        "pixel_sum": 0, "valid": False,
                    })
            yield pd.DataFrame(rows)

    return assets.mapInPandas(decode, PNG_DECODED_SCHEMA)
