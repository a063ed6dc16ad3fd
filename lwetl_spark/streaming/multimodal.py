"""Multimodal (binary) column plumbing.

Images/audio/video are opaque `binary` columns with a typed metadata
struct.  Decode / feature-extraction runs as Arrow-batched `mapInPandas`
— the scale-correct shape for per-item Python work (one Python worker per
partition, batch in/batch out, no per-row serde).

The LEARNED-FEATURE decode is STUBBED (`_fake_decode`): embedding
models are not in this container.  The stub is deterministic (byte
length, crc-like digest, fake 4-dim feature) so tests are stable; swap
`_fake_decode` for a real model call in production — the partitioning,
schema, and batch shape do not change.

Everything below the feature extractor decodes FOR REAL as of r8 —
see `operators/media`: PNG pixel decode + thumbnailing
(`png_thumbnails`), baseline JPEG pixel decode (`jpeg_pixel_stats`),
WAV PCM decode + downsampling (`wav_downsample`), MP4 box census +
exact frame extraction (`mp4_frame_index`).  The generic byte-window
ops in this module (`sample_frames`, `resize_images`) remain the
OPAQUE-payload fallbacks for formats without a codec.
"""

from __future__ import annotations


from collections.abc import Iterator

from pyspark.sql import DataFrame

DECODE_SCHEMA = (
    "doc_id long, mime string, n_bytes long, digest string, "
    "feat array<double>"
)


def decode_binary_features(df: DataFrame) -> DataFrame:
    """Batch-decode a (doc_id, payload binary, meta struct) DataFrame into
    per-item features.  Arrow batches flow through `mapInPandas`; the
    output schema is fixed so downstream plans stay codegen-able.

    The whole closure is self-contained (nested fns + local imports) so
    cloudpickle ships it BY VALUE — Python workers never need
    `lwetl_spark` importable, which a driver-controlled session does not
    guarantee.
    """

    def decode(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import hashlib as _hashlib

        import pandas as pd

        def fake_decode(payload: bytes) -> list[float]:
            # Deterministic stand-in for a real media feature extractor.
            # Real implementation would be e.g.
            #   img = PIL.Image.open(io.BytesIO(payload)).resize((224, 224))
            #   return model(img)
            # — media libs are unavailable here; see module docstring.
            h = _hashlib.md5(payload).digest()
            return [int.from_bytes(h[i : i + 4], "big") / 2**32 for i in range(0, 16, 4)]

        for pdf in batches:
            payloads = pdf["payload"]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "mime": [m["mime"] for m in pdf["meta"]],
                    "n_bytes": payloads.map(len),
                    "digest": payloads.map(lambda b: _hashlib.md5(b).hexdigest()),
                    "feat": payloads.map(fake_decode),
                }
            )

    return df.mapInPandas(decode, schema=DECODE_SCHEMA)


FRAME_SCHEMA = "doc_id long, n_frames int, frame_digests array<string>"


def sample_frames(df: DataFrame, n_frames: int = 4) -> DataFrame:
    """Frame-sampling plumbing for OPAQUE video-like payloads: split
    each binary payload into `n_frames` equal byte windows ("frames")
    and digest each.  For MP4 payloads use the REAL sample-table walk
    (`operators/media.mp4_frame_index`, r8 — exact per-frame byte
    ranges, pts, keyframe flags); this byte-window fallback covers
    container-less blobs, deterministic and engine-portable for the
    oracle.

    Input: (doc_id long, payload binary).  Closure is pickled by value —
    see decode_binary_features.
    """

    def sample(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import hashlib as _hashlib

        import pandas as pd

        k = n_frames  # capture as plain int

        def frames(payload: bytes) -> list[str]:
            w = len(payload) // k
            return [
                _hashlib.md5(b"%d:" % i + payload[i * w : i * w + w]).hexdigest()
                for i in range(k)
            ]

        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_frames": k,
                    "frame_digests": pdf["payload"].map(frames),
                }
            )

    return df.mapInPandas(sample, schema=FRAME_SCHEMA)


RESIZE_SCHEMA = "doc_id long, width int, height int, thumb binary"


def resize_images(df: DataFrame, width: int = 16, height: int = 16) -> DataFrame:
    """Image-resize plumbing for OPAQUE payloads: produce a fixed-size
    thumbnail payload per item by sampling width*height evenly-spaced
    bytes (deterministic, engine-portable).  For PNG payloads use the
    REAL resizer (`operators/media.png_thumbnails` — decode, NN
    resample, re-encode, r8); this fallback covers formats without a
    codec, with identical schema, batching and partitioning.

    Output thumbnails are CONSTANT-size binary, so downstream stages
    (dedup on thumb digest, embedding extraction) can plan for fixed row
    width no matter how large the source media was.  Closure pickles by
    value — see decode_binary_features.
    """

    def resize(batches: "Iterator[pd.DataFrame]") -> "Iterator[pd.DataFrame]":
        import pandas as pd

        w, h = width, height

        def thumb(payload: bytes) -> bytes:
            n = w * h
            if not payload:
                return bytes(n)
            step = max(1, len(payload) // n)
            return bytes(payload[min(i * step, len(payload) - 1)] for i in range(n))

        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "width": w,
                    "height": h,
                    "thumb": pdf["payload"].map(thumb),
                }
            )

    return df.mapInPandas(resize, schema=RESIZE_SCHEMA)


def repartition_by_payload_bytes(
    df: DataFrame,
    payload_col: str = "payload",
    target_bytes: int = 64 * 1024 * 1024,
    min_partitions: int = 1,
) -> DataFrame:
    """Size binary-column partitions by BYTES, not rows.

    Row-count partitioning breaks for media: 10k rows of 10 MB videos is
    100 GB in one task, and a single Arrow record batch must stay well
    under the 2 GB IPC limit.  One cheap agg sums payload length, then a
    round-robin repartition targets `target_bytes` per partition — the
    media analog of `spark.sql.files.maxPartitionBytes` for data already
    in a DataFrame.  (At 100 TB, pair with
    `spark.sql.execution.arrow.maxRecordsPerBatch` to bound rows per
    Arrow batch inside each task.)
    """
    from pyspark.sql import functions as F

    total = df.agg(F.sum(F.length(payload_col))).first()[0] or 0
    parts = max(min_partitions, int(total // target_bytes) + 1)
    return df.repartition(parts)
