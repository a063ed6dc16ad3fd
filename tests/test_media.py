"""Real media-container operators (operators/media): generator
validity (independent byte checks incl. zlib IDAT round-trip), JVM
sniff/dims == Arrow walker parity, corruption detection, and the
one-bad-file-never-kills-a-batch contract."""

from __future__ import annotations

import struct
import zlib

from pyspark.sql import functions as F


def test_png_generator_is_a_real_png():
    """Independent byte-level check: signature, IHDR fields, CRCs, and
    a zlib-decompressible IDAT whose raw size matches the dims."""
    from lwetl_spark.operators.media import png_bytes

    b = png_bytes(7, 3)
    assert b[:8] == b"\x89PNG\r\n\x1a\n"
    ihdr_len = struct.unpack(">I", b[8:12])[0]
    assert ihdr_len == 13 and b[12:16] == b"IHDR"
    w, h = struct.unpack(">II", b[16:24])
    assert (w, h) == (7, 3)
    # IHDR CRC checks out
    assert struct.unpack(">I", b[29:33])[0] == zlib.crc32(b[12:29]) & 0xFFFFFFFF
    # IDAT decompresses to h scanlines of (1 filter byte + w pixels)
    idat_len = struct.unpack(">I", b[33:37])[0]
    assert b[37:41] == b"IDAT"
    raw = zlib.decompress(b[41 : 41 + idat_len])
    assert len(raw) == 3 * (1 + 7)
    assert b.endswith(b"IEND\xaeB`\x82")


def test_wav_generator_is_a_real_wav():
    from lwetl_spark.operators.media import wav_bytes

    b = wav_bytes(16000, 2, 100)
    assert b[:4] == b"RIFF" and b[8:12] == b"WAVE"
    assert struct.unpack("<I", b[4:8])[0] == len(b) - 8
    fmt = struct.unpack("<HHIIHH", b[20:36])
    assert fmt[0] == 1 and fmt[1] == 2 and fmt[2] == 16000 and fmt[5] == 16
    assert b[36:40] == b"data"
    assert struct.unpack("<I", b[40:44])[0] == 100 * 2 * 2


def test_sniff_and_jvm_dims_match_arrow_walker(spark):
    """The JVM sniffer and pure-expression PNG dims must agree with the
    Arrow container walker on every payload of the demo fixture."""
    from lwetl_spark.operators.media import (
        media_meta,
        png_dims,
        sniff_format,
        synth_media_demo,
    )

    ids = spark.range(200).select(F.col("id").alias("doc_id"))
    media = synth_media_demo(ids).localCheckpoint(eager=True)
    meta = {r["doc_id"]: r for r in media_meta(media).collect()}
    sniffed = {
        r["doc_id"]: r["fmt"]
        for r in media.select("doc_id", sniff_format("payload").alias("fmt")).collect()
    }
    assert all(sniffed[i] == meta[i]["fmt"] for i in sniffed)
    w, h = png_dims("payload")
    jvm = {
        r["doc_id"]: (r["w"], r["h"])
        for r in media.filter(F.col("doc_id") % 4 == 0)
        .select("doc_id", w.alias("w"), h.alias("h"))
        .collect()
    }
    for i, (wv, hv) in jvm.items():
        assert (wv, hv) == (meta[i]["width"], meta[i]["height"])
        assert (wv, hv) == (1 + i % 64, 1 + i % 32)
    # WAV geometry: exact-integer duration
    for i, r in meta.items():
        if i % 4 == 2:
            rate = 8000 + 1000 * (i % 8)
            n = 64 + i % 50
            assert r["sample_rate"] == rate and r["n_samples"] == n
            assert r["duration_ms"] == 1000 * n // rate
            assert r["valid"]
        if i % 4 == 3:
            assert r["fmt"] == "unknown" and r["valid"] is False


def test_corrupt_payloads_detected_not_fatal(spark):
    """Truncated PNG (no IEND), mangled JPEG (no EOI), and RIFF with a
    wrong size all come back valid=false with their fmt still sniffed;
    an empty payload is unknown — nothing raises."""
    from lwetl_spark.operators.media import (
        jpeg_bytes,
        media_meta,
        png_bytes,
        wav_bytes,
    )

    png_trunc = png_bytes(5, 5)[:-12]          # IEND gone
    jpeg_noeoi = jpeg_bytes(8, 8)[:-2]         # EOI gone
    wav_bad = bytearray(wav_bytes(8000, 1, 10))
    wav_bad[4:8] = struct.pack("<I", 999)      # RIFF size lies
    rows = [
        (1, bytes(png_trunc)), (2, bytes(jpeg_noeoi)),
        (3, bytes(wav_bad)), (4, b""),
    ]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    out = {r["doc_id"]: r for r in media_meta(df).collect()}
    assert out[1]["fmt"] == "png" and out[1]["valid"] is False
    assert (out[1]["width"], out[1]["height"]) == (5, 5)  # dims still parse
    assert out[2]["fmt"] == "jpeg" and out[2]["valid"] is False
    assert out[3]["fmt"] == "wav" and out[3]["valid"] is False
    assert out[3]["sample_rate"] == 8000
    assert out[4]["fmt"] == "unknown" and out[4]["valid"] is False
