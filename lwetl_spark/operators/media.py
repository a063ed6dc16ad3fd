"""Real media-container operators over binary columns (round 7 —
upgrading the multimodal family past the md5-stub feature extractors
in `streaming/multimodal.py`).

No image/audio libraries exist in this environment, but CONTAINER
engineering needs none: magic-byte format sniffing, PNG IHDR /
JPEG SOF segment / WAV RIFF-fmt header parsing, and structural
validation are pure byte arithmetic — exactly the operations a 100 TB
multimodal ingest runs BEFORE any pixel decode (drop corrupt files,
bucket by resolution/duration, route by format).  Only pixel/sample
DECODE remains stubbed (in streaming/multimodal); everything here
parses real bytes of real container formats.

Spark-first split, by format structure:

- fixed-offset big-endian fields (PNG IHDR) parse as PURE JVM column
  expressions — `conv(hex(substring(payload, 17, 4)), 16, 10)` stays
  inside whole-stage codegen, no Python anywhere;
- variable-structure containers (JPEG marker segments, RIFF chunk
  walks) parse in ONE Arrow-batched `mapInPandas` pass (`media_meta`);
- format sniffing is a JVM CASE over hex prefixes.

The module also ships deterministic generators (`png_bytes`,
`jpeg_bytes`, `wav_bytes` — stdlib struct/zlib only) that build REAL
containers: the PNGs are fully decodable images (valid zlib IDAT,
correct CRCs); the JPEGs are structurally valid JFIF streams (SOI /
APP0 / SOF0 / EOI — segment-scannable; no entropy data, so
container-valid rather than pixel-decodable, stated honestly); the
WAVs are complete PCM files.  The x_media_* oracle keys synthesize
payloads from doc_id arithmetic and value-check every parsed field
against the same arithmetic in DuckDB.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


# ---------------------------------------------------------------- #
# deterministic container generators (stdlib only, workers-safe)    #
# ---------------------------------------------------------------- #

def png_bytes(w: int, h: int) -> bytes:
    """A real, decodable grayscale PNG of zeros: signature + IHDR +
    zlib IDAT + IEND, all CRCs correct."""
    import struct
    import zlib

    def chunk(tag: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data)) + tag + data
            + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 0)
    raw = b"".join(b"\x00" + bytes(w) for _ in range(h))
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


def jpeg_bytes(w: int, h: int) -> bytes:
    """A structurally valid JFIF stream: SOI, APP0, SOF0 carrying the
    dimensions, EOI.  Segment-scannable by any JPEG parser; carries no
    entropy-coded data (honest container, not a decodable image)."""
    import struct

    soi = b"\xff\xd8"
    app0 = (
        b"\xff\xe0" + struct.pack(">H", 16)
        + b"JFIF\x00\x01\x01\x00" + struct.pack(">HH", 1, 1) + b"\x00\x00"
    )
    sof0 = (
        b"\xff\xc0" + struct.pack(">H", 11)
        + b"\x08" + struct.pack(">HH", h, w) + b"\x01\x11\x00"
    )
    return soi + app0 + sof0 + b"\xff\xd9"


def wav_bytes(sample_rate: int, channels: int, n_samples: int) -> bytes:
    """A complete 16-bit PCM WAV of silence: RIFF + fmt + data."""
    import struct

    bits = 16
    data = bytes(n_samples * channels * (bits // 8))
    fmt = struct.pack(
        "<HHIIHH", 1, channels, sample_rate,
        sample_rate * channels * bits // 8, channels * bits // 8, bits,
    )
    body = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", 16) + fmt
        + b"data" + struct.pack("<I", len(data)) + data
    )
    return b"RIFF" + struct.pack("<I", len(body)) + body


def png_bytes_pattern(w: int, h: int, seed: int) -> bytes:
    """A real grayscale PNG whose pixel (r, c) = (seed + 7r + 13c) % 256,
    scanlines alternating filter 0 (None) on even rows and filter 1
    (Sub) on odd rows — so a decoder must run the actual PNG
    reconstruction algorithm, not just strip filter bytes."""
    import struct
    import zlib

    def chunk(tag: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data)) + tag + data
            + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 0)
    lines = []
    for r in range(h):
        raw = bytes((seed + 7 * r + 13 * c) % 256 for c in range(w))
        if r % 2 == 0:
            lines.append(b"\x00" + raw)
        else:  # Sub filter: filt[c] = raw[c] - raw[c-1] (mod 256)
            prev = 0
            filt = bytearray()
            for b in raw:
                filt.append((b - prev) & 0xFF)
                prev = b
            lines.append(b"\x01" + bytes(filt))
    return (
        b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(b"".join(lines)))
        + chunk(b"IEND", b"")
    )


def wav_pcm_bytes(sample_rate: int, samples: list[int], channels: int = 1) -> bytes:
    """A complete 16-bit PCM WAV carrying the given signed samples."""
    import struct

    bits = 16
    data = struct.pack(f"<{len(samples)}h", *samples)
    fmt = struct.pack(
        "<HHIIHH", 1, channels, sample_rate,
        sample_rate * channels * bits // 8, channels * bits // 8, bits,
    )
    body = (
        b"WAVE" + b"fmt " + struct.pack("<I", 16) + fmt
        + b"data" + struct.pack("<I", len(data)) + data
    )
    return b"RIFF" + struct.pack("<I", len(body)) + body


PNG_PIXEL_SCHEMA = (
    "doc_id long, width long, height long, n_px long, sum_px long,"
    " min_px long, max_px long"
)


def png_pixel_stats(df: DataFrame) -> DataFrame:
    """REAL PNG pixel decode — no image library, no stub: zlib-inflate
    the IDAT stream and run the PNG reconstruction algorithm (all five
    scanline filters — None/Sub/Up/Average/Paeth — from the public
    spec, 8-bit grayscale) to recover the actual pixel values, then
    emit exact integer stats per image.  This retires the "pixel
    decode is stubbed" caveat for PNG: the engine decodes real images;
    only learned feature EXTRACTION still wants an external model.

    Input (doc_id, payload binary); non-PNG/undecodable payloads yield
    NULL stats rather than failing the batch.  One Arrow pass; numpy
    does the per-scanline arithmetic."""

    def decode(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import struct
        import zlib

        import numpy as np
        import pandas as pd

        def pixels(b: bytes):
            b = bytes(b)
            if len(b) < 41 or b[:8] != b"\x89PNG\r\n\x1a\n":
                return None
            w, h = struct.unpack(">II", b[16:24])
            bitdepth, colortype = b[24], b[25]
            if bitdepth != 8 or colortype != 0:
                return None  # this decoder: 8-bit grayscale only
            # concatenate IDAT chunks (spec allows several)
            idat = bytearray()
            pos = 8
            while pos + 8 <= len(b):
                ln = struct.unpack(">I", b[pos : pos + 4])[0]
                tag = b[pos + 4 : pos + 8]
                if tag == b"IDAT":
                    idat += b[pos + 8 : pos + 8 + ln]
                if tag == b"IEND":
                    break
                pos += 12 + ln
            try:
                raw = zlib.decompress(bytes(idat))
            except zlib.error:
                return None
            stride = 1 + w  # filter byte + w 1-byte pixels
            if len(raw) != h * stride:
                return None
            out = np.zeros((h, w), dtype=np.uint8)
            prev = np.zeros(w, dtype=np.int32)
            for r in range(h):
                line = raw[r * stride : (r + 1) * stride]
                ftype = line[0]
                cur = np.frombuffer(line[1:], dtype=np.uint8).astype(np.int32)
                if ftype == 0:  # None
                    rec = cur
                elif ftype == 1:  # Sub
                    rec = cur.copy()
                    for c in range(1, w):
                        rec[c] = (rec[c] + rec[c - 1]) & 0xFF
                elif ftype == 2:  # Up
                    rec = (cur + prev) & 0xFF
                elif ftype == 3:  # Average
                    rec = cur.copy()
                    rec[0] = (rec[0] + prev[0] // 2) & 0xFF
                    for c in range(1, w):
                        rec[c] = (rec[c] + (rec[c - 1] + prev[c]) // 2) & 0xFF
                elif ftype == 4:  # Paeth
                    rec = cur.copy()
                    for c in range(w):
                        a = rec[c - 1] if c else 0
                        bb = prev[c]
                        cc = prev[c - 1] if c else 0
                        p = a + bb - cc
                        pa, pb, pc = abs(p - a), abs(p - bb), abs(p - cc)
                        pred = a if (pa <= pb and pa <= pc) else (bb if pb <= pc else cc)
                        rec[c] = (rec[c] + pred) & 0xFF
                else:
                    return None
                out[r] = rec
                prev = rec.astype(np.int32)
            px = out.astype(np.int64)
            return (
                int(w), int(h), int(px.size), int(px.sum()),
                int(px.min()), int(px.max()),
            )

        cols = ["width", "height", "n_px", "sum_px", "min_px", "max_px"]
        for pdf in batches:
            parsed = [pixels(b) for b in pdf["payload"]]
            out = pd.DataFrame(
                [p if p is not None else (None,) * 6 for p in parsed],
                columns=cols,
            )
            out.insert(0, "doc_id", pdf["doc_id"].to_numpy())
            yield out

    return df.mapInPandas(decode, schema=PNG_PIXEL_SCHEMA)


WAV_PCM_SCHEMA = (
    "doc_id long, n_samples long, peak long, sum_abs long, n_clipped long"
)


def wav_pcm_stats(df: DataFrame, clip_at: int = 32767) -> DataFrame:
    """REAL PCM sample decode: walk the RIFF chunks, `np.frombuffer`
    the 16-bit data chunk, and emit exact integer signal stats — peak
    |amplitude|, total |amplitude| (the integer stand-in for RMS:
    hash-stable where sqrt is not), and the clipped-sample count
    (|s| ≥ ``clip_at``) — the loudness/clipping gate an audio ingest
    applies before any model.  Non-WAV payloads yield NULLs; one Arrow
    pass."""

    def decode(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import struct

        import numpy as np
        import pandas as pd

        thr = clip_at

        def stats(b: bytes):
            b = bytes(b)
            if len(b) < 44 or b[:4] != b"RIFF" or b[8:12] != b"WAVE":
                return None
            bits = None
            pos = 12
            data = None
            while pos + 8 <= len(b):
                tag = b[pos : pos + 4]
                size = struct.unpack("<I", b[pos + 4 : pos + 8])[0]
                if tag == b"fmt " and pos + 24 <= len(b):
                    bits = struct.unpack("<H", b[pos + 22 : pos + 24])[0]
                elif tag == b"data":
                    data = b[pos + 8 : pos + 8 + size]
                pos += 8 + size + (size & 1)
            if bits != 16 or data is None or len(data) % 2:
                return None
            s = np.frombuffer(data, dtype="<i2").astype(np.int64)
            if not len(s):
                return (0, 0, 0, 0)
            a = np.abs(s)
            return (len(s), int(a.max()), int(a.sum()), int((a >= thr).sum()))

        cols = ["n_samples", "peak", "sum_abs", "n_clipped"]
        for pdf in batches:
            parsed = [stats(b) for b in pdf["payload"]]
            out = pd.DataFrame(
                [p if p is not None else (None,) * 4 for p in parsed],
                columns=cols,
            )
            out.insert(0, "doc_id", pdf["doc_id"].to_numpy())
            yield out

    return df.mapInPandas(decode, schema=WAV_PCM_SCHEMA)


def synth_pixel_media_demo(
    docs: DataFrame, id_col: str = "doc_id"
) -> DataFrame:
    """Deterministic DECODABLE media per document — the fixture behind
    the pixel/sample-decode oracle keys.  All values are doc_id
    arithmetic, so a SQL oracle can recompute every decoded pixel and
    sample:

    - even ids → patterned PNG: w = 2+(id%16), h = 1+(id%8),
      pixel(r, c) = (id%256 + 7r + 13c) % 256, mixed None/Sub filters
      (the decoder must really reconstruct);
    - odd ids → 16-bit PCM WAV: n = 40+(id%20) samples,
      sample(j) = ((id·31 + j·17) % 65536) − 32768, mono 8 kHz.

    One Arrow pass; generators nested (pickled by value)."""

    def gen(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import struct
        import zlib

        import pandas as pd

        def _png_pat(w: int, h: int, seed: int) -> bytes:
            def chunk(tag: bytes, data: bytes) -> bytes:
                return (
                    struct.pack(">I", len(data)) + tag + data
                    + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
                )

            ihdr = struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 0)
            lines = []
            for r in range(h):
                raw = bytes((seed + 7 * r + 13 * c) % 256 for c in range(w))
                if r % 2 == 0:
                    lines.append(b"\x00" + raw)
                else:
                    prev = 0
                    filt = bytearray()
                    for x in raw:
                        filt.append((x - prev) & 0xFF)
                        prev = x
                    lines.append(b"\x01" + bytes(filt))
            return (
                b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
                + chunk(b"IDAT", zlib.compress(b"".join(lines)))
                + chunk(b"IEND", b"")
            )

        def _wav_pcm(samples: list[int]) -> bytes:
            data = struct.pack(f"<{len(samples)}h", *samples)
            fmt = struct.pack("<HHIIHH", 1, 1, 8000, 16000, 2, 16)
            body = (
                b"WAVE" + b"fmt " + struct.pack("<I", 16) + fmt
                + b"data" + struct.pack("<I", len(data)) + data
            )
            return b"RIFF" + struct.pack("<I", len(body)) + body

        def one(i: int) -> bytes:
            if i % 2 == 0:
                return _png_pat(2 + i % 16, 1 + i % 8, i % 256)
            n = 40 + i % 20
            return _wav_pcm(
                [((i * 31 + j * 17) % 65536) - 32768 for j in range(n)]
            )

        for pdf in batches:
            ids = pdf["doc_id"].astype("int64")
            yield pd.DataFrame({"doc_id": ids, "payload": ids.map(one)})

    return docs.select(F.col(id_col).alias("doc_id")).mapInPandas(
        gen, "doc_id long, payload binary"
    )


def synth_media_demo(
    docs: DataFrame, id_col: str = "doc_id"
) -> DataFrame:
    """Deterministic mixed-media payload per document — the fixture the
    x_media_* oracle keys (and any pipeline demo) share.  doc_id % 4
    picks the format; every parsed field is pure id arithmetic so a SQL
    oracle can recompute it without touching bytes:

    - 0 → PNG,  width 1+(id%64), height 1+(id%32)
    - 1 → JPEG, width 16+(id%32), height 16+(id%16)
    - 2 → WAV,  rate 8000+1000·(id%8), channels 1+(id%2),
              n_samples 64+(id%50)
    - 3 → 16 bytes of 0x00 (no known magic — the corrupt/unknown leg)

    One Arrow pass; generators are stdlib-only and pickled by value.
    """

    def gen(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        # nested copies of the module-level generators: a closure
        # referencing module-level functions pickles BY REFERENCE and
        # dies on workers that cannot import lwetl_spark (the
        # driver-owned-session contract); nested fns ship by value
        import struct
        import zlib

        import pandas as pd

        def _png(w: int, h: int) -> bytes:
            def chunk(tag: bytes, data: bytes) -> bytes:
                return (
                    struct.pack(">I", len(data)) + tag + data
                    + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
                )

            ihdr = struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 0)
            raw = b"".join(b"\x00" + bytes(w) for _ in range(h))
            return (
                b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
                + chunk(b"IDAT", zlib.compress(raw)) + chunk(b"IEND", b"")
            )

        def _jpeg(w: int, h: int) -> bytes:
            app0 = (
                b"\xff\xe0" + struct.pack(">H", 16)
                + b"JFIF\x00\x01\x01\x00" + struct.pack(">HH", 1, 1)
                + b"\x00\x00"
            )
            sof0 = (
                b"\xff\xc0" + struct.pack(">H", 11)
                + b"\x08" + struct.pack(">HH", h, w) + b"\x01\x11\x00"
            )
            return b"\xff\xd8" + app0 + sof0 + b"\xff\xd9"

        def _wav(rate: int, ch: int, n: int) -> bytes:
            bits = 16
            data = bytes(n * ch * (bits // 8))
            fmt = struct.pack(
                "<HHIIHH", 1, ch, rate, rate * ch * bits // 8,
                ch * bits // 8, bits,
            )
            body = (
                b"WAVE" + b"fmt " + struct.pack("<I", 16) + fmt
                + b"data" + struct.pack("<I", len(data)) + data
            )
            return b"RIFF" + struct.pack("<I", len(body)) + body

        def one(i: int) -> bytes:
            m = i % 4
            if m == 0:
                return _png(1 + i % 64, 1 + i % 32)
            if m == 1:
                return _jpeg(16 + i % 32, 16 + i % 16)
            if m == 2:
                return _wav(8000 + 1000 * (i % 8), 1 + i % 2, 64 + i % 50)
            return bytes(16)

        for pdf in batches:
            ids = pdf["doc_id"].astype("int64")
            yield pd.DataFrame({"doc_id": ids, "payload": ids.map(one)})

    return docs.select(F.col(id_col).alias("doc_id")).mapInPandas(
        gen, "doc_id long, payload binary"
    )


# ---------------------------------------------------------------- #
# JVM-side parsers (whole-stage codegen, zero Python)                #
# ---------------------------------------------------------------- #

def sniff_format(payload: Column | str) -> Column:
    """Magic-byte format sniff as ONE JVM CASE expression — the routing
    filter in front of any per-format decode stage, fully inside
    whole-stage codegen (hex + substring + CASE; no UDF)."""
    col = F.col(payload) if isinstance(payload, str) else payload
    hx = F.hex(F.substring(col, 1, 12))
    return (
        F.when(hx.startswith("89504E470D0A1A0A"), "png")
        .when(hx.startswith("FFD8FF"), "jpeg")
        .when(
            hx.startswith("52494646")
            & (F.hex(F.substring(col, 9, 4)) == "57415645"),
            "wav",
        )
        .when(hx.startswith("474946383761") | hx.startswith("474946383961"), "gif")
        .when(hx.startswith("25504446"), "pdf")
        .otherwise("unknown")
    )


def png_dims(payload: Column | str) -> tuple[Column, Column]:
    """PNG width/height as PURE JVM expressions: IHDR is always the
    first chunk, so the 4-byte big-endian dims sit at fixed offsets
    17/21 — `conv(hex(substring(...)), 16, 10)` parses them without
    leaving codegen.  The Spark-first statement of this module: fixed-
    offset fields never need Python."""
    col = F.col(payload) if isinstance(payload, str) else payload
    w = F.conv(F.hex(F.substring(col, 17, 4)), 16, 10).cast("long")
    h = F.conv(F.hex(F.substring(col, 21, 4)), 16, 10).cast("long")
    return w, h


# ---------------------------------------------------------------- #
# Arrow-batched container walker                                    #
# ---------------------------------------------------------------- #

MEDIA_META_SCHEMA = (
    "doc_id long, fmt string, width long, height long, channels long,"
    " sample_rate long, n_samples long, duration_ms long, valid boolean"
)


def media_meta(df: DataFrame) -> DataFrame:
    """Parse (doc_id, payload binary) into per-item container metadata:
    format, dimensions (PNG IHDR / JPEG SOF segment scan), PCM audio
    geometry (WAV RIFF chunk walk; duration_ms = 1000·n_samples div
    rate, exact integer), and structural validity (PNG signature+IEND
    trailer; JPEG SOI…EOI; WAV RIFF size consistency).  Unknown or
    corrupt payloads come back (fmt='unknown', valid=false, NULL
    fields) instead of failing the batch — one bad file must never
    kill an ingest task.

    Variable-structure containers need a byte walk, so this is the
    module's one Arrow `mapInPandas` pass; closures are stdlib-only and
    pickled by value."""

    def parse(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import struct

        import pandas as pd

        def png(b: bytes):
            if len(b) < 33 or b[:8] != b"\x89PNG\r\n\x1a\n":
                return None
            w, h = struct.unpack(">II", b[16:24])
            valid = b.endswith(b"IEND\xaeB`\x82")
            return ("png", w, h, None, None, None, None, valid)

        def jpeg(b: bytes):
            if len(b) < 4 or b[:3] != b"\xff\xd8\xff":
                return None
            w = h = None
            pos = 2
            while pos + 4 <= len(b) and b[pos] == 0xFF:
                marker = b[pos + 1]
                if marker == 0xD9:  # EOI
                    break
                if 0xD0 <= marker <= 0xD8 or marker == 0x01:
                    pos += 2
                    continue
                seg_len = struct.unpack(">H", b[pos + 2 : pos + 4])[0]
                if marker in (0xC0, 0xC1, 0xC2, 0xC3) and pos + 9 <= len(b):
                    h, w = struct.unpack(">HH", b[pos + 5 : pos + 9])
                pos += 2 + seg_len
            valid = b.endswith(b"\xff\xd9") and w is not None
            return ("jpeg", w, h, None, None, None, None, valid)

        def wav(b: bytes):
            if len(b) < 44 or b[:4] != b"RIFF" or b[8:12] != b"WAVE":
                return None
            riff_size = struct.unpack("<I", b[4:8])[0]
            ch = rate = bits = data_size = None
            pos = 12
            while pos + 8 <= len(b):
                tag = b[pos : pos + 4]
                size = struct.unpack("<I", b[pos + 4 : pos + 8])[0]
                if tag == b"fmt " and pos + 24 <= len(b):
                    _, ch, rate, _, _, bits = struct.unpack(
                        "<HHIIHH", b[pos + 8 : pos + 24]
                    )
                elif tag == b"data":
                    data_size = size
                pos += 8 + size + (size & 1)
            if not (ch and rate and bits and data_size is not None):
                return None
            n = data_size // (ch * (bits // 8))
            valid = riff_size == len(b) - 8
            return ("wav", None, None, ch, rate, n, 1000 * n // rate, valid)

        def one(b: bytes):
            b = bytes(b)
            for p in (png, jpeg, wav):
                got = p(b)
                if got is not None:
                    return got
            return ("unknown", None, None, None, None, None, None, False)

        cols = ["fmt", "width", "height", "channels", "sample_rate",
                "n_samples", "duration_ms", "valid"]
        for pdf in batches:
            parsed = [one(b) for b in pdf["payload"]]
            out = pd.DataFrame(parsed, columns=cols)
            out.insert(0, "doc_id", pdf["doc_id"].to_numpy())
            yield out

    return df.mapInPandas(parse, schema=MEDIA_META_SCHEMA)
