"""Multimodal (binary) column plumbing.

Images/audio/video are opaque `binary` columns with a typed metadata
struct.  Decode / feature-extraction runs as Arrow-batched `mapInPandas`
— the scale-correct shape for per-item Python work (one Python worker per
partition, batch in/batch out, no per-row serde).

The actual media decode is STUBBED (`_fake_decode`): the image/audio
libraries are not in this container.  The stub is deterministic (byte
length, crc-like digest, fake 4-dim feature) so tests are stable; swap
`_fake_decode` for a real PIL/librosa call in production — the
partitioning, schema, and batch shape do not change.
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
    """Frame-sampling plumbing for video-like payloads: split each binary
    payload into `n_frames` equal byte windows ("frames") and digest each
    — the Spark-side shape of ffmpeg-style keyframe extraction (swap the
    window digest for a real decoder per frame; batching, schema and
    partitioning are unchanged).  Byte-window arithmetic keeps the stub
    deterministic and engine-portable for the oracle.

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
