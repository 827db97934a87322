"""Multimodal plumbing tests: container round-trip, poison-blob tolerance,
resize math, frame fan-out shape, codec stub."""

import pytest
from pyspark.sql import functions as F

from vector_store_spark.operators.multimodal import (
    HEADER_LEN,
    MAGIC,
    decode_meta,
    decode_real,
    fake_dims,
    frame_sample,
    resize_plan,
    synth_assets,
)


@pytest.fixture(scope="module")
def assets(spark):
    docs = spark.createDataFrame(
        [(0, "x" * 100), (1, "y" * 800), (2, "z" * 1000), (3, ""), (5, "v" * 300)],
        ["doc_id", "text"],
    )
    return synth_assets(docs)


def test_container_roundtrip(assets):
    rows = {r.doc_id: r for r in decode_meta(assets).collect()}
    assert rows[0].modality == "image" and rows[1].modality == "audio" and rows[2].modality == "video"
    w, h = fake_dims(0)
    assert (rows[0].width, rows[0].height) == (w, h)
    assert rows[1].payload_bytes == 800
    assert rows[1].duration_ms == 100.0  # 800 bytes @ 8kHz
    assert rows[2].n_frames == 4  # ceil(1000/256)
    assert all(r.valid for r in rows.values())


def test_poison_blob_yields_invalid_not_exception(spark):
    bad = spark.createDataFrame(
        [(1, "image", bytearray(b"NOPE123456789")), (2, "image", bytearray(b"")),
         (3, "image", None)],
        "doc_id long, modality string, content binary",
    )
    rows = decode_meta(bad).collect()
    assert [r.valid for r in rows] == [False, False, False]


def test_resize_plan_math(spark):
    decoded = spark.createDataFrame(
        [(1, "image", 32, 48, 0, 0.0, 0, True),
         (2, "image", 128, 96, 0, 0.0, 0, True),
         (3, "video", 128, 96, 0, 0.0, 1, True)],
        "doc_id long, modality string, width int, height int, "
        "payload_bytes long, duration_ms double, n_frames int, valid boolean",
    )
    rows = {r.doc_id: r for r in resize_plan(decoded, box=64).collect()}
    assert (rows[1].new_width, rows[1].new_height) == (32, 48)  # fits, unchanged
    assert (rows[2].new_width, rows[2].new_height) == (64, 48)  # 128x96 -> 64x48
    assert 3 not in rows  # non-image filtered


def test_frame_sample_fanout(assets):
    rows = frame_sample(assets, every_n=2).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r)
    # doc 2: 1000 bytes -> 4 frames -> sampled 0, 2
    idx = sorted(r.frame_idx for r in by_doc[2])
    assert idx == [0, 2]
    last = max(by_doc[2], key=lambda r: r.frame_idx)
    assert last.byte_offset == HEADER_LEN + 2 * 256
    assert last.frame_bytes == 256
    # doc 5: 300 bytes -> 2 frames -> sampled 0 only; short tail frame exists at idx 1
    assert sorted(r.frame_idx for r in by_doc[5]) == [0]


def test_decode_real_rejects_unsupported_formats():
    # the FAKE container's magic is neither BMP nor WAV — formats beyond the
    # stdlib codecs are the documented plug-point and must raise
    with pytest.raises(NotImplementedError):
        decode_real(MAGIC + b"\0" * 20)


def test_patch_grid_counts_and_edges(spark):
    from vector_store_spark.operators.multimodal import patch_grid

    decoded = spark.createDataFrame(
        [(1, "image", 17, 9, True), (2, "image", 8, 8, True),
         (3, "video", 64, 64, True), (4, "image", 0, 0, False)],
        "doc_id long, modality string, width int, height int, valid boolean",
    )
    got = patch_grid(decoded, patch=8).collect()
    by_doc = {}
    for r in got:
        by_doc.setdefault(r.doc_id, []).append(r)
    # 17x9 with 8px patches -> 3x2 grid; edge patches clip to 1px wide / 1px tall
    assert len(by_doc[1]) == 6
    edge = {(r.px, r.py): (r.patch_w, r.patch_h) for r in by_doc[1]}
    assert edge[(0, 0)] == (8, 8) and edge[(2, 0)] == (1, 8) and edge[(2, 1)] == (1, 1)
    assert len(by_doc[2]) == 1 and by_doc[2][0].patch_w == 8
    assert 3 not in by_doc and 4 not in by_doc  # non-image / invalid dropped


def test_real_codec_roundtrip_pure():
    """The REAL-codec leg: bytes written by a real encoder (stdlib wave /
    hand-packed BMP) decode back via real header parsing — dims, sample
    counts, durations and file sizes all round-trip."""
    from vector_store_spark.operators.multimodal import (
        bmp_row_bytes, decode_real, encode_bmp, encode_wav, fake_dims,
        wav_samples,
    )

    for i in (0, 2, 46, 100):
        w, h = fake_dims(i)
        m = decode_real(encode_bmp(w, h, seed=i))
        assert (m["modality"], m["width"], m["height"]) == ("image", w, h)
        assert m["bits_per_pixel"] == 24
        assert m["payload_bytes"] == 54 + bmp_row_bytes(w) * h
    for i in (1, 3, 47, 101):
        n = wav_samples(i)
        m = decode_real(encode_wav(n, seed=i))
        assert (m["modality"], m["n_samples"], m["sample_rate"]) == ("audio", n, 8000)
        assert m["payload_bytes"] == 44 + 2 * n
        assert m["duration_ms"] == n * 1000.0 / 8000
    import pytest

    with pytest.raises(NotImplementedError):
        decode_real(b"GIF89a notacodecwehave")


def test_decode_real_meta_poison_blobs_never_raise(spark):
    """Poison-blob rule on the real leg: corrupt/foreign/empty bytes yield
    valid=false rows, never executor exceptions."""
    from vector_store_spark.operators.multimodal import (
        decode_real_meta, encode_bmp, encode_wav,
    )

    assets = spark.createDataFrame(
        [(1, bytearray(encode_bmp(20, 10, seed=1))),
         (2, bytearray(encode_wav(500, seed=2))),
         (3, bytearray(b"BM" + b"\x00" * 10)),      # truncated BMP header
         (4, bytearray(b"RIFFxxxxWAVE" + b"\x01" * 4)),  # mangled WAV
         (5, bytearray(b"")), (6, None)],
        "doc_id long, content binary",
    )
    rows = {r.doc_id: r for r in decode_real_meta(assets).collect()}
    assert rows[1].valid and rows[1].modality == "image" and rows[1].width == 20
    assert rows[2].valid and rows[2].n_samples == 500
    for bad in (3, 4, 5, 6):
        assert not rows[bad].valid, bad


def test_png_codec_roundtrip_pure():
    """The PNG leg end to end without Spark: stored-deflate size arithmetic,
    CRC-verified chunk walk, inflate, de-filter (all five filter types —
    heights >= 5 cycle None/Sub/Up/Average/Paeth), exact pixel
    reconstruction."""
    import numpy as np

    from vector_store_spark.operators.multimodal import (
        decode_png, decode_real, encode_png, fake_dims, png_file_bytes,
    )

    for doc_id in (0, 4, 8, 444, 2024):
        w, h = fake_dims(doc_id)
        blob = encode_png(w, h, seed=doc_id)
        assert len(blob) == png_file_bytes(w, h)
        m = decode_png(blob)
        assert (m["width"], m["height"], m["bits_per_pixel"]) == (w, h, 24)
        assert m["payload_bytes"] == len(blob)
        n = 3 * w * h
        assert m["pixel_sum"] == int(((doc_id + np.arange(n)) % 256).sum())
        # decode_real dispatches PNG containers to the same decoder
        assert decode_real(blob)["width"] == w


def test_png_paeth_average_filters_byte_exact():
    """Ingest-grade de-filtering: hand-build PNGs whose EVERY row uses
    filter 3 (Average) or filter 4 (Paeth) and check the reconstruction
    byte-for-byte against the known pixel array — plus a level-9 stream,
    the shape a real encoder (libpng default heuristics) emits."""
    import struct
    import zlib

    import numpy as np

    from vector_store_spark.operators.multimodal import (
        _PNG_SIG, _paeth_predictor, _png_chunk, decode_png, encode_png,
    )

    rng_px = (np.arange(3 * 7 * 9, dtype=np.int64) * 31 + 5) % 256
    w, h = 7, 9
    px = rng_px.reshape(h, 3 * w)
    for filt in (3, 4):
        parts = []
        zero = np.zeros(3 * w, dtype=np.int64)
        for r in range(h):
            row = px[r]
            prev = px[r - 1] if r > 0 else zero
            left = np.concatenate([zero[:3], row[:-3]])
            upleft = np.concatenate([zero[:3], prev[:-3]])
            if filt == 3:
                enc = (row - (left + prev) // 2) % 256
            else:
                enc = (row - _paeth_predictor(left, prev, upleft)) % 256
            parts.append(bytes([filt]) + enc.astype(np.uint8).tobytes())
        ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
        blob = (_PNG_SIG + _png_chunk(b"IHDR", ihdr)
                + _png_chunk(b"IDAT", zlib.compress(b"".join(parts), 9))
                + _png_chunk(b"IEND", b""))
        m = decode_png(blob)
        assert m["pixel_sum"] == int(px.sum()), f"filter {filt} mismatch"
    # the Paeth tie-break order (left -> up -> upleft) matters: a pixel
    # pattern where p equals two neighbors must still reconstruct exactly
    assert list(_paeth_predictor(
        np.array([10, 0, 5]), np.array([10, 7, 5]), np.array([10, 7, 5])
    )) == [10, 0, 5]
    # level-9 encode_png roundtrips and genuinely compresses the ramp
    b0 = encode_png(33, 17, seed=11, level=0)
    b9 = encode_png(33, 17, seed=11, level=9)
    assert len(b9) < len(b0)
    assert decode_png(b9)["pixel_sum"] == decode_png(b0)["pixel_sum"]


def test_png_decode_rejects_corruption():
    """A real decoder detects damage: flipped bytes fail the CRC check,
    truncation fails the chunk walk."""
    import pytest

    from vector_store_spark.operators.multimodal import decode_png, encode_png

    blob = encode_png(20, 10, seed=3)
    flipped = bytearray(blob)
    flipped[60] ^= 0xFF
    with pytest.raises(ValueError):
        decode_png(bytes(flipped))
    with pytest.raises(ValueError):
        decode_png(blob[:40])


def test_png_paletted_decode_byte_exact():
    """VERDICT r15 #5 — PLTE expansion: color type 3 indices expand through
    the palette and pixel_sum covers the EXPANDED RGB bytes, byte-exact
    against an independent recomputation from the deterministic generators;
    all five filters exercised over the 1-byte index plane, at stored and
    level-9 streams."""
    from vector_store_spark.operators.multimodal import (
        decode_png,
        encode_png_paletted,
    )

    w, h, seed = 23, 11, 5
    # independent expectation: palette[k] bytes summed over the index ramp
    pal = [((7 * k) % 256) + ((11 * k + 3) % 256) + ((13 * k + 5) % 256)
           for k in range(256)]
    want = sum(pal[(seed + i) % 256] for i in range(w * h))
    for level in (0, 9):
        meta = decode_png(encode_png_paletted(w, h, seed=seed, level=level))
        assert meta["width"] == w and meta["height"] == h
        assert meta["bits_per_pixel"] == 24  # consumer-visible depth
        assert meta["pixel_sum"] == want, level
    # paletted without PLTE is loud
    import re
    import struct as _struct

    from vector_store_spark.operators.multimodal import _png_chunk, _PNG_SIG

    blob = encode_png_paletted(8, 4)
    import pytest
    no_plte = bytearray()
    pos = 8
    no_plte += _PNG_SIG
    while pos + 12 <= len(blob):
        (ln,) = _struct.unpack(">I", blob[pos:pos + 4])
        typ = blob[pos + 4:pos + 8]
        if typ != b"PLTE":
            no_plte += blob[pos:pos + 12 + ln]
        pos += 12 + ln
    with pytest.raises(ValueError, match=re.escape("PLTE")):
        decode_png(bytes(no_plte))


def test_png_interlace_rejected_loudly():
    """Adam7 must fail via an EXPLICIT interlace check (was: an incidental
    IDAT-size mismatch), before any IDAT work."""
    import struct as _struct

    import pytest

    from vector_store_spark.operators.multimodal import (
        _png_chunk,
        _PNG_SIG,
        decode_png,
    )

    ihdr = _struct.pack(">IIBBBBB", 8, 8, 8, 2, 0, 0, 1)  # interlace=1
    blob = _PNG_SIG + _png_chunk(b"IHDR", ihdr) + _png_chunk(b"IEND", b"")
    with pytest.raises(ValueError, match="Adam7"):
        decode_png(blob)
    # unknown interlace methods are invalid too
    ihdr2 = _struct.pack(">IIBBBBB", 8, 8, 8, 2, 0, 0, 7)
    blob2 = _PNG_SIG + _png_chunk(b"IHDR", ihdr2) + _png_chunk(b"IEND", b"")
    with pytest.raises(ValueError, match="interlace"):
        decode_png(blob2)


def test_decode_png_meta_poison_blobs_never_raise(spark):
    from vector_store_spark.operators.multimodal import decode_png_meta, encode_png

    assets = spark.createDataFrame(
        [(1, bytearray(encode_png(20, 10, seed=1))),
         (2, bytearray(b"\x89PNG\r\n\x1a\x08 wrong sig tail")),
         (3, bytearray(b"")), (4, None)],
        "doc_id long, content binary",
    )
    rows = {r.doc_id: r for r in decode_png_meta(assets).collect()}
    assert rows[1].valid and rows[1].width == 20 and rows[1].pixel_sum > 0
    for bad in (2, 3, 4):
        assert not rows[bad].valid, bad
