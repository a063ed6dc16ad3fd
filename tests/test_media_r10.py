"""Round-10 media depth: TIFF-LZW codec (bit-exact vector + early
change polarity), multi-strip / predictor TIFF decode, the count>1
IFD pointer fix, PDF innermost-stream-dict anchoring + embedded-image
extraction (DCTDecode routing, foreign-filter rejection), and the
zero-dimension image guards from ADVICE r9."""

from __future__ import annotations

import struct

from pyspark.sql import functions as F


def _pack_msb(codes):
    """Independent MSB-first bit packer: [(code, width)] -> bytes.
    Deliberately NOT the encoder under test."""
    acc = 0
    n = 0
    out = bytearray()
    for code, w in codes:
        acc = (acc << w) | code
        n += w
        while n >= 8:
            out.append((acc >> (n - 8)) & 0xFF)
            n -= 8
    if n:
        out.append((acc << (8 - n)) & 0xFF)
    return bytes(out)


def test_tiff_lzw_hand_vector():
    """The encoder's exact output for a small input is hand-derived
    (codes 256,7,258,8,8,258,6,6,257 all at 9 bits), and the decoder
    inverts an INDEPENDENTLY packed copy of that stream."""
    from lwetl_spark.operators.media import tiff_lzw_decode, tiff_lzw_encode

    data = bytes([7, 7, 7, 8, 8, 7, 7, 6, 6])
    expect_codes = [(c, 9) for c in (256, 7, 258, 8, 8, 258, 6, 6, 257)]
    assert tiff_lzw_encode(data) == _pack_msb(expect_codes)
    assert tiff_lzw_decode(_pack_msb(expect_codes), len(data)) == data


def test_tiff_lzw_early_change_polarity():
    """Pin the decoder's width-bump position per TIFF 6 early change:
    after the table add that makes the next free code 511 (the 253rd
    add, which happens while processing the 254th code), reads switch
    to 10 bits — so literal #255 onward is packed 10-bit.  A GIF-style
    decoder (bump at 512) reads garbage here."""
    from lwetl_spark.operators.media import tiff_lzw_decode

    lits = [i % 251 for i in range(400)]
    # ensure no two adjacent literals repeat a prior pair (251 is
    # prime vs the 400 range, pairs (i%251, (i+1)%251) are distinct)
    codes = [(256, 9)]
    for k, v in enumerate(lits, start=1):
        width = 9 if k <= 254 else 10
        codes.append((v, width))
    codes.append((257, 10))
    got = tiff_lzw_decode(_pack_msb(codes), len(lits))
    assert got == bytes(lits)


def test_tiff_lzw_roundtrip_across_width_boundaries():
    """Encoder/decoder agree across the 9->10->11 bumps and the
    table-full Clear reset (incompressible input grows the table
    fastest)."""
    from lwetl_spark.operators.media import tiff_lzw_decode, tiff_lzw_encode

    # pseudo-random but deterministic, few repeated pairs
    data = bytes((i * 197 + (i * i) % 251) % 256 for i in range(30000))
    assert tiff_lzw_decode(tiff_lzw_encode(data), len(data)) == data
    assert tiff_lzw_decode(tiff_lzw_encode(b""), 0) == b""
    # robustness: truncated stream, garbage codes
    assert tiff_lzw_decode(b"", 4) is None
    enc = tiff_lzw_encode(data[:100])
    assert tiff_lzw_decode(enc[: len(enc) // 2], 100) is None


def test_tiff_ifd_count_gt1_dereferences_pointer():
    """ADVICE r9: a BitsPerSample entry with count=3 stores a POINTER
    in its value cell; the census must dereference it (bits=8), not
    report the pointer as the bit depth."""
    from lwetl_spark.operators.media import parse_tiff

    for e, bom in (("<", b"II"), (">", b"MM")):
        out = bytearray(bom + struct.pack(e + "H", 42) + bytes(4))
        bps_ptr = len(out)
        out += struct.pack(e + "HHH", 8, 8, 8)  # the 3-sample array
        ifd = len(out)
        out[4:8] = struct.pack(e + "I", ifd)

        def entry(tag, typ, cnt, val):
            raw = struct.pack(e + "HHI", tag, typ, cnt)
            if typ == 3 and cnt == 1:
                return raw + struct.pack(e + "HH", val, 0)
            return raw + struct.pack(e + "I", val)

        ents = [
            entry(256, 4, 1, 20), entry(257, 4, 1, 10),
            entry(258, 3, 3, bps_ptr),  # count=3 -> pointer cell
            entry(259, 3, 1, 1),
        ]
        out += struct.pack(e + "H", len(ents)) + b"".join(ents) + bytes(4)
        r = parse_tiff(bytes(out))
        assert r is not None and r["valid"]
        assert r["pages"][0]["bits"] == 8  # not bps_ptr
        assert r["pages"][0]["width"] == 20
        # dangling pointer -> tag skipped, page survives
        bad = bytearray(out)
        p = ifd + 2 + 2 * 12 + 8  # BitsPerSample value cell
        bad[p : p + 4] = struct.pack(e + "I", len(out) + 999)
        r2 = parse_tiff(bytes(bad))
        assert r2["valid"] and r2["pages"][0]["bits"] is None


def test_tiff_multistrip_lzw_predictor_decode(spark):
    """Every storage combination decodes to the same pixels: single
    vs multi strip × compression 1/5 × predictor 1/2, both byte
    orders — the r10 x_tiff_pixels legs."""
    from lwetl_spark.operators.media import tiff_bytes, tiff_pixel_stats

    exp = [(33 + 7 * rr + 13 * cc) % 256
           for rr in range(10) for cc in range(9)]
    want = (len(exp), sum(exp), min(exp), max(exp))
    for little in (True, False):
        for comp in (1, 5):
            for rps in (10, 4, 3, 1):
                for pred in (1, 2):
                    b = tiff_bytes([(9, 10, 8, comp, rps, pred)],
                                   little=little, seed=33)
                    df = spark.createDataFrame(
                        [(1, b)], "doc_id long, payload binary")
                    r = tiff_pixel_stats(df).collect()[0]
                    got = (r["n_px"], r["sum_px"], r["min_px"],
                           r["max_px"])
                    assert got == want, (little, comp, rps, pred)
                    assert (r["width"], r["height"]) == (9, 10)


def test_tiff_strip_count_mismatch_nulls(spark):
    """Strip geometry that disagrees with height/RowsPerStrip is an
    honest NULL, never an exception."""
    from lwetl_spark.operators.media import tiff_bytes, tiff_pixel_stats

    b = bytearray(tiff_bytes([(9, 10, 8, 1, 4, 1)], seed=3))
    # corrupt RowsPerStrip to 7: ceil(10/7)=2 != 3 strips present
    r = None
    from lwetl_spark.operators.media import parse_tiff

    page = parse_tiff(bytes(b))["pages"][0]
    assert page["rows_per_strip"] == 4 and len(page["strip_offs"]) == 3
    # find + patch the 278 entry value (LONG at entry cell)
    ifd_off = struct.unpack("<I", b[4:8])[0]
    n = struct.unpack("<H", b[ifd_off : ifd_off + 2])[0]
    for i in range(n):
        p = ifd_off + 2 + 12 * i
        tag = struct.unpack("<H", b[p : p + 2])[0]
        if tag == 278:
            b[p + 8 : p + 12] = struct.pack("<I", 7)
    df = spark.createDataFrame([(1, bytes(b))],
                               "doc_id long, payload binary")
    r = tiff_pixel_stats(df).collect()[0]
    assert r["n_px"] is None


def test_pdf_innermost_stream_dict():
    """ADVICE r9: the stream dict is the INNERMOST balanced <<...>>
    before 'stream' — a preceding unrelated dict mentioning /Filter
    (or /FlateDecode) must not poison the raw stream's routing, and a
    nested dict inside the stream dict must not break the scan."""
    from lwetl_spark.operators.media import extract_pdf_text, pdf_bytes

    b = pdf_bytes(["real text"])
    # poison: an annotation-ish object mentioning /Filter before the
    # raw content stream
    poisoned = b.replace(
        b"<< /Type /Catalog /Pages 2 0 R >>",
        b"<< /Type /Catalog /Pages 2 0 R /Junk /Filter /Odd >>")
    assert extract_pdf_text(poisoned) == ["real text"]
    # nested dict INSIDE the stream dict (e.g. /DecodeParms)
    raw = b"BT (nested ok) Tj ET"
    doc = (b"%PDF-1.7\n1 0 obj\n<< /Length "
           + str(len(raw)).encode() + b" /DP << /K 1 /Cols 2 >>"
           b" >>\nstream\n" + raw + b"\nendstream\nendobj\n")
    assert extract_pdf_text(doc) == ["nested ok"]


def test_pdf_image_extraction_routes_dct(spark=None):
    """Embedded DCTDecode XObjects come back as byte-identical JPEG
    streams in file order; JPX/raw image streams are reported with
    their filter names, never decoded here."""
    import numpy as np

    from lwetl_spark.operators.media import (
        decode_jpeg,
        extract_pdf_images,
        jpeg_baseline_bytes,
        pdf_bytes,
    )

    import zlib

    coeffs = [((7 + 17 * bi) % 112 - 56, (3 + 5 * bi) % 13)
              for bi in range(4)]
    jp = jpeg_baseline_bytes(16, 16, coeffs)
    raw = bytes((9 * r + 23 * c) % 256 for r in range(5)
                for c in range(6))
    b = pdf_bytes(
        ["caption"],
        images=[("DCTDecode", 16, 16, jp),
                ("JPXDecode", 8, 8, b"\x00" * 32),
                ("FlateDecode", 6, 5, zlib.compress(raw)),
                ("", 4, 4, bytes(16))],
    )
    imgs = extract_pdf_images(b)
    assert [f for f, *_ in imgs] == [
        "DCTDecode", "JPXDecode", "FlateDecode", ""]
    assert [(w, h) for _, w, h, _, _, _ in imgs] == [
        (16, 16), (8, 8), (6, 5), (4, 4)]
    assert imgs[0][4] == jp
    px = decode_jpeg(imgs[0][4])
    assert px is not None and px.shape == (16, 16)
    # a JPX blob through decode_jpeg must fail cleanly, not decode
    assert decode_jpeg(imgs[1][4]) is None
    # the Flate gray leg round-trips and is flagged gray8
    assert imgs[2][3] is True
    assert zlib.decompress(imgs[2][4]) == raw
    # non-PDF / image-free PDFs
    assert extract_pdf_images(b"GIF89a") is None
    assert extract_pdf_images(pdf_bytes(["no images"])) == []
    assert isinstance(np.int64(1), np.integer)  # keep numpy import


def test_gif_zero_dim_frame_is_null_not_crash(spark):
    """ADVICE r9 (medium): a GIF image descriptor with width or
    height 0 must yield NULL stats, not a zero-size-reduction
    ValueError killing the task."""
    from lwetl_spark.operators.media import (
        gif_decode_pixels,
        gif_lzw_bytes,
        gif_pixel_stats,
    )

    b = bytearray(gif_lzw_bytes(6, 5, 9, 7, 1))
    # locate the image descriptor (skip header + GCT + extensions)
    packed = b[10]
    pos = 13 + (3 * (2 << (packed & 7)) if packed & 0x80 else 0)
    while b[pos] == 0x21:
        p = pos + 2
        while b[p] != 0:
            p += 1 + b[p]
        pos = p + 1
    assert b[pos] == 0x2C
    for wz, hz in ((0, 5), (6, 0), (0, 0)):
        bb = bytearray(b)
        bb[pos + 5 : pos + 9] = struct.pack("<HH", wz, hz)
        assert gif_decode_pixels(bytes(bb)) is None
        df = spark.createDataFrame([(1, bytes(bb))],
                                   "doc_id long, payload binary")
        r = gif_pixel_stats(df).collect()[0]
        assert r["n_px"] is None  # and no task failure


def test_png_zero_dim_is_null_not_crash(spark):
    """Same guard for PNG: IHDR with width/height 0 (spec-illegal)
    must decode to None -> NULL stats."""
    from lwetl_spark.operators.media import (
        _make_png_codec,
        png_bytes,
        png_pixel_stats,
    )

    png_decode, _ = _make_png_codec()
    b = bytearray(png_bytes(7, 3))
    for wz, hz in ((0, 3), (7, 0)):
        bb = bytearray(b)
        bb[16:24] = struct.pack(">II", wz, hz)
        assert png_decode(bytes(bb)) is None
        df = spark.createDataFrame([(1, bytes(bb))],
                                   "doc_id long, payload binary")
        assert png_pixel_stats(df).collect()[0]["n_px"] is None


def test_vtt_no_id_malformed_timestamp_keeps_first_text_line(spark):
    """ADVICE r9: a cue with NO identifier whose timestamp line is
    malformed must still treat line 0 as the timestamp line — text
    keeps the first real text line (valid stays false)."""
    from lwetl_spark.operators.media import vtt_cues

    vtt = ("WEBVTT\n\n"
           "00:0x:00.000 --> 00:05.000\nfirst text\nsecond line")
    df = spark.createDataFrame([(1, vtt)], "doc_id long, vtt string")
    r = vtt_cues(df).collect()[0]
    assert r["valid"] is False
    assert r["text"] == "first text\nsecond line"
    # identifier + malformed timestamp: text starts at line 2
    vtt2 = ("WEBVTT\n\n"
            "cue-1\n00:0x:00.000 --> 00:05.000\nbody here")
    df2 = spark.createDataFrame([(1, vtt2)], "doc_id long, vtt string")
    r2 = vtt_cues(df2).collect()[0]
    assert r2["valid"] is False and r2["text"] == "body here"
    # healthy cue without identifier still parses
    vtt3 = "WEBVTT\n\n00:01.000 --> 00:05.000\nok text"
    df3 = spark.createDataFrame([(1, vtt3)], "doc_id long, vtt string")
    r3 = vtt_cues(df3).collect()[0]
    assert r3["valid"] and r3["start_ms"] == 1000
    assert r3["text"] == "ok text"


def test_zip64_roundtrip_and_stdlib_crosscheck():
    """zip64 archives (EOCD64 + locator + 0x0001 extras) read in both
    directions vs stdlib zipfile: ours->stdlib and stdlib's
    force_zip64 -> ours; a corrupt locator is an honest None."""
    import io
    import zipfile

    from lwetl_spark.operators.media import (
        extract_zip_member,
        parse_zip,
        zip_bytes,
    )

    members = [("a.txt", b"hello world" * 10, "stored"),
               ("dir/b.bin", bytes(range(256)) * 4, "deflate"),
               ("c", b"", "stored")]
    for z64 in (False, True):
        b = zip_bytes(members, zip64=z64)
        r = parse_zip(b)
        assert r is not None and r["valid"]
        assert [m["name"] for m in r["members"]] == [
            "a.txt", "dir/b.bin", "c"]
        for m, (_, data, _) in zip(r["members"], members):
            assert extract_zip_member(b, m) == data
        zf = zipfile.ZipFile(io.BytesIO(b))
        assert zf.testzip() is None
        for n, data, _ in members:
            assert zf.read(n) == data
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        for n, data, meth in members:
            zi = zipfile.ZipInfo(n)
            zi.compress_type = (zipfile.ZIP_STORED if meth == "stored"
                                else zipfile.ZIP_DEFLATED)
            with zf.open(zi, "w", force_zip64=True) as f:
                f.write(data)
    sb = buf.getvalue()
    r = parse_zip(sb)
    assert r is not None and r["valid"]
    for m, (_, data, _) in zip(r["members"], members):
        assert extract_zip_member(sb, m) == data
    bb = bytearray(zip_bytes(members, zip64=True))
    i = bytes(bb).rfind(b"PK\x06\x07")
    bb[i : i + 4] = b"XXXX"
    assert parse_zip(bytes(bb)) is None


def test_mp3_vbr_xing_vbri_and_lying_tag(spark):
    """VBR MP3 (r10): per-frame bitrate walk, Xing/Info/VBRI tag
    parse — and when the tag LIES about the frame count, duration
    still comes from the walk; the claim surfaces as tag_frames."""
    from lwetl_spark.operators.media import mp3_bytes, mp3_meta

    brs = [1 + (3 * f) % 14 for f in range(12)]
    honest = mp3_bytes.vbr(brs, 0, tag="Xing")
    lying = mp3_bytes.vbr(brs, 0, tag="Xing", tag_frames=99)
    vbri = mp3_bytes.vbr(brs, 1, tag="VBRI")
    info = mp3_bytes.vbr([9] * 6, 2, tag="Info")
    plain = mp3_bytes(9, 1, 3)
    df = spark.createDataFrame(
        [(1, honest), (2, lying), (3, vbri), (4, info), (5, plain)],
        "doc_id long, payload binary")
    out = {r["doc_id"]: r for r in mp3_meta(df).collect()}
    BITR = [0, 32, 40, 48, 56, 64, 80, 96, 112, 128,
            160, 192, 224, 256, 320]
    avg = sum(BITR[i] for i in brs) // len(brs)
    for d in (1, 2):
        r = out[d]
        assert r["valid"] and r["vbr"] and r["n_frames"] == 12
        assert r["bitrate_kbps"] == avg
        assert r["duration_ms"] == 1000 * 1152 * 12 // 44100
    assert out[1]["tag_frames"] == 12
    assert out[2]["tag_frames"] == 99  # the lie, reported not trusted
    r3 = out[3]
    assert r3["vbr"] and r3["tag_frames"] == 12 and r3["valid"]
    assert r3["duration_ms"] == 1000 * 1152 * 12 // 48000
    r4 = out[4]  # Info = LAME's CBR marker: NOT vbr, tag still read
    assert r4["vbr"] is False and r4["tag_frames"] == 6
    assert r4["bitrate_kbps"] == 128
    r5 = out[5]  # untagged CBR: vbr false, tag_frames NULL
    assert r5["vbr"] is False and r5["tag_frames"] is None
    assert r5["n_frames"] == 3 and r5["valid"]


def test_imgtext_class_dhashes_distinct_and_stable():
    """Fixture safety pin for x_imgtext_pairs: the gate-passing image
    classes must have pairwise-DISTINCT dhashes (a collision would
    silently merge two classes' pairs), and byte-identical content
    must collide exactly."""
    import numpy as np

    from lwetl_spark.operators.media import (
        _make_png_codec,
        decode_jpeg,
        jpeg_baseline_bytes,
    )

    png_decode, png_encode = _make_png_codec()

    def class_bytes(k):
        w, h = 10 + k % 30, 10 + (3 * k) % 25
        if k % 2 == 0:
            px = np.fromfunction(
                lambda r, c: (k * 29 + 7 * r + 13 * c
                              + (r * c * (k % 7 + 1)) % 64) % 256,
                (h, w), dtype=np.int64).astype(np.uint8)
            return png_encode(px)
        nb = ((w + 7) // 8) * ((h + 7) // 8)
        coeffs = [((13 * k + 29 * b) % 112 - 56, (7 * k + 5 * b) % 13)
                  for b in range(nb)]
        return jpeg_baseline_bytes(w, h, coeffs)

    def dhash(b):
        px = png_decode(b) if b[:8] == b"\x89PNG\r\n\x1a\n" \
            else decode_jpeg(b)
        assert px is not None
        h0, w0 = px.shape[:2]
        rows = (np.arange(8) * h0) // 8
        cols = (np.arange(9) * w0) // 9
        g = np.asarray(px, dtype=np.int64)[np.ix_(rows, cols)]
        bits = (g[:, :8] > g[:, 1:]).astype(np.uint64)
        idx = (np.arange(8)[:, None] * 8
               + np.arange(8)[None, :]).astype(np.uint64)
        return int((bits << idx).sum())

    passing = [k for k in range(40)
               if 10 + k % 30 >= 16 and 10 + (3 * k) % 25 >= 16]
    hashes = {k: dhash(class_bytes(k)) for k in passing}
    assert len(set(hashes.values())) == len(passing), hashes
    # determinism: same class -> same bytes -> same hash
    assert dhash(class_bytes(passing[0])) == hashes[passing[0]]


def test_imgtext_pairs_lifecycle(spark):
    """The flagship composition end-to-end on a small shard set:
    census gate order, dhash cross-url merge, broken-copy exclusion,
    and the zero-readmission campaign contract."""
    import lwetl_spark.queries_etl  # noqa: F401  (registers the key)
    from lwetl_spark.queries import QUERIES

    out = {r["img_url"]: r for r in
           QUERIES["x_imgtext_pairs"](spark, "/root/testdata/sf0.001")
           .collect()}
    assert out, "no pairs mined"
    for url, r in out.items():
        assert r["no_readmission"] is True
        assert r["width"] >= 16 and r["height"] >= 16
        assert r["n_copies"] >= 1 and r["n_refs"] >= r["n_copies"] - 1
        assert r["caption"].startswith("Img caption ")
    # mirror classes (k%5==3) merged under the cdn canonical url:
    # every reference contributes a tag at BOTH hosts, so the merged
    # group's n_refs is even, and no images.example row remains for
    # that class k
    cdn = [u for u in out if u.startswith("http://cdn.example/")]
    assert cdn, "no mirror classes surfaced"
    for u in cdn:
        assert out[u]["n_refs"] % 2 == 0
        k = u.rsplit("mim", 1)[1].split(".")[0]
        assert ("http://images.example/im%s.png" % k) not in out


def test_packbits_spec_vector_and_roundtrip():
    """PackBits pinned against Apple's published example vector, plus
    round-trips over runs/noise and truncation robustness."""
    from lwetl_spark.operators.media import packbits_decode, packbits_encode

    vec = bytes([0xFE, 0xAA, 0x02, 0x80, 0x00, 0x2A, 0xFD, 0xAA,
                 0x03, 0x80, 0x00, 0x2A, 0x22, 0xF7, 0xAA])
    exp = bytes([0xAA] * 3 + [0x80, 0x00, 0x2A] + [0xAA] * 4
                + [0x80, 0x00, 0x2A, 0x22] + [0xAA] * 10)
    assert packbits_decode(vec, len(exp)) == exp
    for data in (b"", b"x", bytes([7] * 300) + bytes(range(100)),
                 bytes((i * 37) % 256 for i in range(1000))):
        assert packbits_decode(packbits_encode(data), len(data)) == data
    assert packbits_decode(b"", 3) is None
    assert packbits_decode(b"\xfe", 3) is None  # repeat w/o its byte


def test_tiff_packbits_strip_decode(spark):
    """Compression 32773 pages decode pixel-exact (with predictor and
    multi-strip), completing the scanner trio raw/LZW/PackBits."""
    from lwetl_spark.operators.media import tiff_bytes, tiff_pixel_stats

    exp = [(5 + 7 * rr + 13 * cc) % 256
           for rr in range(10) for cc in range(9)]
    want = (len(exp), sum(exp), min(exp), max(exp))
    for little in (True, False):
        for rps, pred in ((10, 1), (4, 2), (3, 1)):
            b = tiff_bytes([(9, 10, 8, 32773, rps, pred)],
                           little=little, seed=5)
            df = spark.createDataFrame([(1, b)],
                                       "doc_id long, payload binary")
            r = tiff_pixel_stats(df).collect()[0]
            assert (r["n_px"], r["sum_px"], r["min_px"],
                    r["max_px"]) == want, (little, rps, pred)


def test_pdf_lzw_text_stream():
    """LZWDecode content streams (decode-until-EOI) extract the same
    text as raw/Flate; a truncated LZW stream is skipped, never a
    failure."""
    from lwetl_spark.operators.media import extract_pdf_text, pdf_bytes

    texts = ["alpha beta 1", "gamma 2"]
    b = pdf_bytes(texts, codec="lzw")
    assert extract_pdf_text(b) == texts
    assert extract_pdf_text(pdf_bytes(texts)) == texts
    assert extract_pdf_text(pdf_bytes(texts, codec="flate")) == texts
    # corrupt the LZW stream body: that stream skips, the rest stays
    i = b.find(b"stream\n") + 7
    bad = b[:i] + b"\x00\x00" + b[i + 2:]
    got = extract_pdf_text(bad)
    assert got is not None and texts[1] in got and texts[0] not in got


def test_pdf_flate_gray_image_stats(spark):
    """FlateDecode /DeviceGray 8-bit image XObjects decode to exact
    pixel stats; a non-gray Flate image stays decoded=false."""
    import zlib

    from lwetl_spark.operators.media import pdf_bytes, pdf_image_stats

    raw = bytes((3 + 9 * r + 23 * c) % 256
                for r in range(5) for c in range(6))
    b = pdf_bytes(["t"], images=[("FlateDecode", 6, 5,
                                  zlib.compress(raw))])
    # non-gray variant: strip the DeviceGray marker
    b2 = b.replace(b"/ColorSpace /DeviceGray", b"/ColorSpace /DeviceRGB")
    df = spark.createDataFrame([(1, b), (2, b2)],
                               "doc_id long, payload binary")
    out = {r["doc_id"]: r for r in pdf_image_stats(df).collect()}
    r1 = out[1]
    assert r1["decoded"] and (r1["width"], r1["height"]) == (6, 5)
    assert r1["sum_px"] == sum(raw) and r1["min_px"] == min(raw)
    assert out[2]["decoded"] is False and out[2]["filter"] == "FlateDecode"


def test_dhash_near_dup_radius_and_recall(spark):
    """4-band LSH recall is exact at hamming <= 3: hand-built hashes
    at distance 0/1/3 pair up, distance 4 does not (even when it
    shares a band), and >3 max_hamming is refused."""
    import pytest

    from lwetl_spark.operators.media import dhash_near_dup

    base = 0x0123456789ABCDEF
    rows = [
        (1, "%016x" % base),
        (2, "%016x" % base),                      # dist 0
        (3, "%016x" % (base ^ 0x1)),              # dist 1
        (4, "%016x" % (base ^ 0b111)),            # dist 3
        (5, "%016x" % (base ^ 0x000F)),           # dist 4: shares 3
        # bands with base but must NOT pair (verify filter)
        (6, "%016x" % (base ^ ((1 << 0) | (1 << 16) | (1 << 32)
                               | (1 << 48)))),    # dist 4, every band
        # dirty: candidate only via... no shared band -> never seen
    ]
    df = spark.createDataFrame(rows, "doc_id long, dhash string")
    got = {(r["id_l"], r["id_r"]): r["hamming"]
           for r in dhash_near_dup(df).collect()}
    assert got[(1, 2)] == 0 and got[(2, 3)] == 1
    assert got[(1, 3)] == 1 and got[(1, 4)] == 3
    assert (1, 5) not in got and (1, 6) not in got
    assert got[(3, 4)] == 2  # 0b1 vs 0b111
    with pytest.raises(ValueError):
        dhash_near_dup(df, max_hamming=4)
    # no all-pairs stage
    plan = dhash_near_dup(df)._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_dhash_neardup_fixture_variant_distances(spark):
    """The fixture's variant geometry holds end-to-end through the
    real PNG decode: same class variants (0,1,2,3) sit at the
    designed hamming distances."""
    from lwetl_spark.operators.media import (
        dhash_near_dup,
        image_dhash,
        synth_dhash_neardup_demo,
    )

    # ids 0,10,20,30 are class 0 variants t=0,1,2,3
    docs = spark.createDataFrame([(i,) for i in (0, 10, 20, 30)],
                                 "doc_id long")
    hashes = image_dhash(synth_dhash_neardup_demo(docs))
    assert all(r["ok"] for r in hashes.collect())
    got = {(r["id_l"], r["id_r"]): r["hamming"]
           for r in dhash_near_dup(hashes.select("doc_id", "dhash"))
           .collect()}
    assert got[(0, 10)] == 1 and got[(0, 20)] == 2 and got[(0, 30)] == 3
    assert got[(10, 20)] == 3  # {13} vs {26,43}
    assert (10, 30) not in got and (20, 30) not in got  # 4 and 5


def test_id3_tags_versions_encodings_and_lying_frame(spark):
    """ID3v2.3 plain sizes vs v2.4 syncsafe, all four text encodings,
    TDRC/TYER, PRIV skipped-but-counted, and a frame size lying past
    the tag end (partial parse, valid=false)."""
    from lwetl_spark.operators.media import id3_tags, synth_id3_demo

    docs = spark.createDataFrame(
        [(i,) for i in (0, 1, 2, 3, 19, 38)], "doc_id long")
    out = {r["doc_id"]: r for r in
           id3_tags(synth_id3_demo(docs)).collect()}
    for i in (1, 2, 3):
        r = out[i]
        assert r["version"] == ("2.4" if i % 2 == 0 else "2.3")
        assert r["title"] == "Track %d" % i
        assert r["artist"] == "Artist %d" % (i % 25)
        assert r["album"] == "Album %d" % (i % 12)
        assert r["year"] == 1990 + i % 35
        assert r["n_frames"] == 5 and r["valid"]
    for i in (0, 19, 38):  # the lying-size leg
        r = out[i]
        assert r["valid"] is False and r["n_frames"] == 4
        assert r["title"] == "Track %d" % i  # frames before the lie
        assert r["year"] is None
    # non-ID3 payload -> NULLs
    df2 = spark.createDataFrame([(9, b"\xff\xfb junk")],
                                "doc_id long, payload binary")
    r9 = id3_tags(df2).collect()[0]
    assert r9["title"] is None and r9["valid"] is False


def test_wav_pcm_all_depths(spark):
    """8/16/24/32-bit PCM decode to native-scale stats with the clip
    gate scaled per depth; a non-whole-sample data chunk is NULL."""
    import struct

    from lwetl_spark.operators.media import wav_pcm_stats

    def wav(bits, samples16, stray=False):
        if bits == 8:
            data = bytes((((v >> 8) + 128) & 0xFF) for v in samples16)
        elif bits == 16:
            data = b"".join(struct.pack("<h", v) for v in samples16)
        elif bits == 24:
            data = b"".join(((v << 8) & 0xFFFFFF).to_bytes(3, "little")
                            for v in samples16)
        else:
            data = b"".join(struct.pack("<i", v << 16)
                            for v in samples16)
        if stray:
            data += b"\x00"
        fmt = struct.pack("<HHIIHH", 1, 1, 16000, 16000 * bits // 8,
                          bits // 8, bits)
        body = (b"fmt " + struct.pack("<I", len(fmt)) + fmt
                + b"data" + struct.pack("<I", len(data)) + data)
        return (b"RIFF" + struct.pack("<I", 4 + len(body))
                + b"WAVE" + body)

    vals = [-32768, -1, 0, 1, 32767, 20000, -32767]
    rows = [(bits, wav(bits, vals)) for bits in (8, 16, 24, 32)]
    rows.append((99, wav(24, vals, stray=True)))
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    out = {r["doc_id"]: r for r in wav_pcm_stats(df).collect()}
    for bits, scale, thr in ((16, 1, 32767), (24, 256, 32767 * 256),
                             (32, 65536, 32767 * 65536)):
        r = out[bits]
        native = [v * scale for v in vals]
        assert r["n_samples"] == len(vals)
        assert r["peak"] == max(abs(v) for v in native)
        assert r["sum_abs"] == sum(abs(v) for v in native)
        assert r["n_clipped"] == sum(abs(v) >= thr for v in native)
    r8 = out[8]
    native8 = [v >> 8 for v in vals]  # floor shift, matches storage
    assert r8["peak"] == max(abs(v) for v in native8)
    assert r8["sum_abs"] == sum(abs(v) for v in native8)
    assert r8["n_clipped"] == sum(abs(v) >= 127 for v in native8)
    assert out[99]["n_samples"] is None  # stray byte -> honest NULL


def test_bigtiff_walk_and_decode(spark):
    """BigTIFF (magic 43 — the >4 GiB scanner form, the TIFF-side
    zip64): 8-byte offsets/counts, 20-byte entries, LONG8 strips —
    walks and pixel-decodes identically to classic TIFF in both byte
    orders; a wrong offset-size header is an honest None."""
    import struct

    from lwetl_spark.operators.media import (
        parse_tiff,
        tiff_bytes,
        tiff_pixel_stats,
    )

    exp = [(42 + 7 * rr + 13 * cc) % 256
           for rr in range(10) for cc in range(9)]
    want = (len(exp), sum(exp), min(exp), max(exp))
    for little in (True, False):
        b = tiff_bytes([(9, 10, 8, 5, 4, 2)], little=little, seed=42,
                       bigtiff=True)
        r = parse_tiff(b)
        assert r["valid"] and r["bigtiff"] and len(r["pages"]) == 1
        df = spark.createDataFrame([(1, b)],
                                   "doc_id long, payload binary")
        s = tiff_pixel_stats(df).collect()[0]
        assert (s["n_px"], s["sum_px"], s["min_px"], s["max_px"]) \
            == want, little
    # spec: BigTIFF offset size MUST be 8 (constant 0 follows)
    assert parse_tiff(
        b"II" + struct.pack("<HHH", 43, 4, 0) + bytes(8)) is None
    assert parse_tiff(b"II\x2b\x00" + bytes(8)) is None  # truncated


def test_zip_bzip2_and_lzma_members():
    """APPNOTE methods 12 (bzip2) and 14 (LZMA, version+props header,
    EOS-agnostic raw stream) extract CRC-verified; truncated streams
    are honest Nones.  Cross-checked against stdlib zipfile in both
    directions (stdlib writes both methods)."""
    import io
    import zipfile

    from lwetl_spark.operators.media import (
        extract_zip_member,
        parse_zip,
        zip_bytes,
    )

    members = [("a.txt", b"bzip me " * 200, zipfile.ZIP_BZIP2),
               ("b.bin", bytes(range(256)) * 30, zipfile.ZIP_LZMA),
               ("c.txt", b"plain", zipfile.ZIP_STORED)]
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        for n, data, meth in members:
            zi = zipfile.ZipInfo(n)
            zi.compress_type = meth
            with zf.open(zi, "w") as f:
                f.write(data)
    sb = buf.getvalue()
    r = parse_zip(sb)
    assert r["valid"]
    assert [x["method"] for x in r["members"]] == [12, 14, 0]
    for mm, (_, data, _) in zip(r["members"], members):
        assert extract_zip_member(sb, mm) == data
    short = dict(r["members"][0])
    short["comp_size"] -= 5
    assert extract_zip_member(sb, short) is None
    # our generator's bzip2 members read back through stdlib
    ours = zip_bytes([("x", b"payload " * 50, "bzip2")])
    zf2 = zipfile.ZipFile(io.BytesIO(ours))
    assert zf2.read("x") == b"payload " * 50


def test_tiled_tiff_decode(spark):
    """Tiled TIFF (tags 322-325 — the GIS/scan-pyramid layout): padded
    edge tiles decode and crop correctly across compressions,
    predictor, byte orders, and BigTIFF framing; a tile-count lie is
    an honest NULL."""
    import struct

    from lwetl_spark.operators.media import (
        parse_tiff,
        tiff_bytes,
        tiff_pixel_stats,
    )

    exp = [(33 + 7 * r + 13 * c) % 256
           for r in range(10) for c in range(9)]
    want = (len(exp), sum(exp), min(exp), max(exp))
    for little in (True, False):
        for big in (False, True):
            for comp, pred, tile in ((1, 1, (4, 3)), (5, 2, (16, 16)),
                                     (32773, 1, (9, 10))):
                b = tiff_bytes([(9, 10, 8, comp, 10, pred, tile)],
                               little=little, seed=33, bigtiff=big)
                p0 = parse_tiff(b)["pages"][0]
                assert (p0["tile_width"], p0["tile_length"]) == tile
                df = spark.createDataFrame(
                    [(1, b)], "doc_id long, payload binary")
                r = tiff_pixel_stats(df).collect()[0]
                assert (r["n_px"], r["sum_px"], r["min_px"],
                        r["max_px"]) == want, (little, big, comp)
    # lie: patch TileWidth so the tile count disagrees
    b = tiff_bytes([(9, 10, 8, 1, 10, 1, (4, 3))], seed=33)
    bb = bytearray(b)
    ifd = struct.unpack("<I", bb[4:8])[0]
    n = struct.unpack("<H", bb[ifd : ifd + 2])[0]
    for i in range(n):
        p = ifd + 2 + 12 * i
        if struct.unpack("<H", bb[p : p + 2])[0] == 322:
            bb[p + 8 : p + 12] = struct.pack("<I", 7)
    df = spark.createDataFrame([(1, bytes(bb))],
                               "doc_id long, payload binary")
    assert tiff_pixel_stats(df).collect()[0]["n_px"] is None


def test_warc_gz_per_record_members():
    """.warc.gz (per-record gzip members, the Common Crawl layout)
    inflates transparently; a corrupt or truncated member keeps the
    records from intact leading members AND flags the shard."""
    from lwetl_spark.operators.media import (
        gunzip_members,
        parse_warc,
        warc_bytes,
    )

    recs = [("warcinfo", None, b"sw"),
            ("response", "http://a/b", b"hello world"),
            ("response", "http://a/c", b"bytes " * 50)]
    plain = warc_bytes(recs)
    gz = warc_bytes(recs, gz=True)
    assert gz[:2] == b"\x1f\x8b"
    assert gunzip_members(gz) == (plain, True)
    r = parse_warc(gz)
    assert r["valid"] and len(r["records"]) == 3
    assert [x["byte_sum"] for x in r["records"]] == [
        sum(b"sw"), sum(b"hello world"), sum(b"bytes " * 50)]
    # corrupt the SECOND member's magic: record 0 survives, flagged
    i = gz.index(b"\x1f\x8b", 2)
    bad = gz[:i] + b"XX" + gz[i + 2:]
    r2 = parse_warc(bad)
    assert len(r2["records"]) == 1 and r2["valid"] is False
    # truncated tail member: flagged
    r3 = parse_warc(gz[: len(gz) - 4])
    assert r3["valid"] is False
    # stdlib gzip reads our members back (one-member case)
    import gzip as _gzip
    one = warc_bytes(recs[:1], gz=True)
    assert _gzip.decompress(one) == warc_bytes(recs[:1])


def test_image_captions_chunk_contracts(spark):
    """PNG tEXt/zTXt/iTXt + JPEG COM extraction: encodings round-trip
    (incl. non-ASCII UTF-8 iTXt), a bad zlib chunk skips alone, and
    non-image payloads yield the sentinel row."""
    from lwetl_spark.operators.media import (
        image_captions,
        synth_image_caption_demo,
    )

    docs = spark.createDataFrame([(i,) for i in (0, 1, 2, 4, 23, 46)],
                                 "doc_id long")
    out = {}
    for r in image_captions(synth_image_caption_demo(docs)).collect():
        out.setdefault(r["doc_id"], []).append(
            (r["item_idx"], r["source"], r["key"], r["text"]))
    assert out[1] == [(0, "jpeg_com", "comment", "Jpeg comment 1")]
    assert out[2] == [
        (0, "png_text", "Title", "Img title 2"),
        (1, "png_ztxt", "Description", "Compressed desc 2"),
        (2, "png_itxt", "Comment", "Unicode caption 2 é"),
    ]
    # i%4==0: iTXt is the COMPRESSED form; same decoded text
    assert (2, "png_itxt", "Comment", "Unicode caption 4 é") in out[4]
    # corrupted zTXt (46 is even and %23==0): skipped, indices shift
    assert out[46] == [
        (0, "png_text", "Title", "Img title 46"),
        (1, "png_itxt", "Comment", "Unicode caption 46 é"),
    ]
    # non-image payload
    df2 = spark.createDataFrame([(9, b"not an image")],
                                "doc_id long, payload binary")
    r9 = image_captions(df2).collect()[0]
    assert r9["item_idx"] == -1 and r9["source"] == "none"


def test_truncated_dht_is_null_not_crash():
    """r10 mutation-fuzz find: a DHT segment declaring more Huffman
    symbols than it carries must decode to None, not IndexError."""
    import struct

    from lwetl_spark.operators.media import decode_jpeg, jpeg_baseline_bytes

    b = jpeg_baseline_bytes(16, 16, [(3, 2)] * 4)
    assert decode_jpeg(b) is not None
    # find the DHT segment and inflate its first 'bits' count so
    # sum(bits) exceeds the symbols actually present
    i = b.find(b"\xff\xc4")
    assert i > 0
    bb = bytearray(b)
    bb[i + 5] = 250  # bits[0] lies
    assert decode_jpeg(bytes(bb)) is None


def test_svg_meta_jvm_parse(spark):
    """SVG census: attribute vs viewBox-only sizing, px suffix strip,
    element censuses, title, and the missing-close-tag leg."""
    from lwetl_spark.operators.media import svg_meta

    rows = [
        (1, '<svg width="64px" height="48px" viewBox="0 0 64 48">'
            '<title>T</title><path d="M0 0"/><text>x</text></svg>'),
        (2, '<svg viewBox="0 0 100 50"><path d="M0 0"/>'
            '<image href="a.png"/></svg>'),
        (3, '<svg width="10" height="9">no close'),
        (4, "not svg at all"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, svg string")
    out = {r["doc_id"]: r for r in svg_meta(df).collect()}
    r1 = out[1]
    assert (r1["width"], r1["height"]) == (64, 48)
    assert (r1["vb_w"], r1["vb_h"]) == (64, 48)
    assert r1["n_paths"] == 1 and r1["n_texts"] == 1
    assert r1["title"] == "T" and r1["valid"]
    r2 = out[2]
    assert (r2["width"], r2["height"]) == (-1, -1)  # viewBox-only
    assert (r2["vb_w"], r2["vb_h"]) == (100, 50)
    assert r2["n_images"] == 1 and r2["title"] is None
    assert out[3]["valid"] is False and out[4]["valid"] is False


def test_heif_walker_fullbox_meta_and_size_lie(spark):
    """HEIF/AVIF: 'meta' parsed as the FULLBOX it is; multi-extent
    files census all ispes; a size lie keeps earlier extents and
    flags; mp4-brand ftyp is NOT heif; sniff routes the brand
    family."""
    import struct

    from pyspark.sql import functions as F2

    from lwetl_spark.operators.media import (
        heif_bytes,
        heif_meta,
        parse_heif,
        sniff_format,
    )

    b = heif_bytes("avif", [(640, 480), (32, 24)])
    r = parse_heif(b)
    assert r["brand"] == "avif" and r["ispes"] == [(640, 480), (32, 24)]
    assert r["valid"]
    assert parse_heif(b"\x00\x00\x00\x10ftypisom\x00\x00\x00\x00") is None
    p = b.rfind(b"ispe") - 4
    bb = bytearray(b)
    (sz,) = struct.unpack(">I", bb[p : p + 4])
    bb[p : p + 4] = struct.pack(">I", sz + 999)
    r2 = parse_heif(bytes(bb))
    assert r2["ispes"] == [(640, 480)] and r2["valid"] is False
    df = spark.createDataFrame(
        [(1, b), (2, b"\x00\x00\x00\x10ftypisom\x00\x00\x00\x00"),
         (3, None)],
        "doc_id long, payload binary")
    out = {r["doc_id"]: r for r in heif_meta(df).collect()}
    assert out[1]["width"] == 640 and out[1]["n_ispe"] == 2
    assert out[2]["brand"] is None and out[3]["valid"] is False
    sn = {r["doc_id"]: r["fmt"] for r in df.select(
        "doc_id", sniff_format("payload").alias("fmt")).collect()}
    assert sn[1] == "heif" and sn[2] == "mp4"
    assert F2 is not None
