"""Multimodal columns: image/audio/video as opaque `binary` + typed
metadata, with decode / feature-extract / resize / frame-sample as
Arrow-batched mapInPandas stages.

The decode libraries (PIL/ffmpeg/librosa) are NOT in this container, so
the decoders are stubbed: `deterministic=True` produces a fake-but-
deterministic feature vector from the bytes (sha256-seeded), while
`deterministic=False` raises NotImplementedError at the point a real
decoder would run. Everything Spark-side — schema, batch iteration,
partitioning, UDF signatures — is real and tested; swapping in a real
decoder changes one pure function.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "media_id long, kind string, payload binary, width int, height int, "
    "duration_ms int"
)
FEATURE_SCHEMA = "media_id long, kind string, n_bytes int, feature array<float>"
FRAME_SCHEMA = "media_id long, frame_idx int, frame_sha string"

FEATURE_DIM = 16


def _fake_decode(payload: bytes, dim: int = FEATURE_DIM) -> np.ndarray:
    """Deterministic stand-in for a real decoder: features derived from the
    content digest. Replace with PIL/librosa/ffmpeg in production."""
    h = hashlib.sha256(payload).digest()
    raw = np.frombuffer((h * ((dim * 4) // len(h) + 1))[: dim * 4], dtype=np.uint32)
    return (raw.astype(np.float64) / np.iinfo(np.uint32).max).astype(np.float32)


def extract_features(media: DataFrame, deterministic: bool = True) -> DataFrame:
    """binary payload → fixed-dim feature vector, one Arrow batch at a time."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            if not deterministic:
                raise NotImplementedError(
                    "real image/audio decode requires PIL/librosa — not in "
                    "this container; use deterministic=True"
                )
            feats = [
                _fake_decode(bytes(p)).tolist() if p is not None else None
                for p in b["payload"]
            ]
            yield pd.DataFrame(
                {
                    "media_id": b["media_id"],
                    "kind": b["kind"],
                    "n_bytes": [len(bytes(p)) if p is not None else 0 for p in b["payload"]],
                    "feature": feats,
                }
            )

    return media.mapInPandas(run, schema=FEATURE_SCHEMA)


def sample_frames(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame sampling stub: emits one row per sampled frame index
    (duration_ms / every_ms frames), frame content = digest of
    (payload, idx). Real impl would seek+decode; the row explosion,
    batching and schema are the production shape."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            ids, idxs, shas = [], [], []
            for mid, kind, payload, dur in zip(
                b["media_id"], b["kind"], b["payload"], b["duration_ms"]
            ):
                if kind != "video" or payload is None or dur is None:
                    continue
                for i in range(max(int(dur) // every_ms, 1)):
                    ids.append(mid)
                    idxs.append(i)
                    shas.append(
                        hashlib.sha256(bytes(payload) + i.to_bytes(4, "big")).hexdigest()
                    )
            yield pd.DataFrame({"media_id": ids, "frame_idx": idxs, "frame_sha": shas})

    return media.mapInPandas(run, schema=FRAME_SCHEMA)


def synth_media_df(spark, n: int = 64) -> DataFrame:
    """Deterministic synthetic media table for tests."""
    kinds = ["image", "audio", "video"]
    rows = [
        (
            i,
            kinds[i % 3],
            hashlib.sha256(f"media:{i}".encode()).digest() * 4,
            64 + i % 128,
            48 + i % 96,
            1000 * (1 + i % 5),
        )
        for i in range(n)
    ]
    return spark.createDataFrame(rows, MEDIA_SCHEMA)
