"""Multimodal columns: image/audio/video as opaque `binary` + typed
metadata, with decode / feature-extract / resize / frame-sample as
Arrow-batched mapInPandas stages.

The decode libraries (PIL/ffmpeg/librosa) are NOT in this container, so
the decoders are stubbed: `deterministic=True` produces a fake-but-
deterministic feature vector from the content digest, while
`deterministic=False` raises NotImplementedError at the point a real
decoder would run. Everything Spark-side — schema, batch iteration,
partitioning, UDF signatures — is real and tested; swapping in a real
decoder changes one pure function.

Oracle design: every derived value is a pure function of the payload's
HEX STRING (DuckDB's sha256 only accepts VARCHAR), so the DuckDB oracle
reproduces features and frame hashes bit-for-bit from `range()` — the
checked outputs are exact integers/strings, never floats.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "media_id long, kind string, payload binary, width int, height int, "
    "duration_ms int"
)
FEATURE_SCHEMA = (
    "media_id long, kind string, n_bytes int, feature array<float>, "
    "u32 array<long>"
)
FRAME_SCHEMA = "media_id long, frame_idx int, frame_sha string"

FEATURE_DIM = 16
SYNTH_N = 64  # rows in the registered synthetic media table


def _fake_decode(payload: bytes, dim: int = FEATURE_DIM) -> tuple[list, np.ndarray]:
    """Deterministic stand-in for a real decoder. Returns (u32s, floats):
    u32s are little-endian uint32 words of sha256(hex(payload)) cycled to
    `dim` entries (exact ints — the oracle-checked value); floats are
    u32/uint32_max as float32 (the production embedding shape). Replace
    with PIL/librosa/ffmpeg in production."""
    h = hashlib.sha256(payload.hex().encode()).digest()
    h2 = (h * ((dim * 4) // len(h) + 1))[: dim * 4]
    u32 = np.frombuffer(h2, dtype="<u4")
    floats = (u32.astype(np.float64) / np.iinfo(np.uint32).max).astype(np.float32)
    return u32.astype(np.int64).tolist(), floats


def extract_features(media: DataFrame, deterministic: bool = True) -> DataFrame:
    """binary payload → fixed-dim feature vector, one Arrow batch at a time."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            if not deterministic:
                raise NotImplementedError(
                    "real image/audio decode requires PIL/librosa — not in "
                    "this container; use deterministic=True"
                )
            u32s, feats = [], []
            for p in b["payload"]:
                if p is None:
                    u32s.append(None)
                    feats.append(None)
                else:
                    u, f = _fake_decode(bytes(p))
                    u32s.append(u)
                    feats.append(f.tolist())
            yield pd.DataFrame(
                {
                    "media_id": b["media_id"],
                    "kind": b["kind"],
                    "n_bytes": [
                        len(bytes(p)) if p is not None else 0 for p in b["payload"]
                    ],
                    "feature": feats,
                    "u32": u32s,
                }
            )

    return media.mapInPandas(run, schema=FEATURE_SCHEMA)


def features_checked(media: DataFrame) -> DataFrame:
    """Oracle-comparable projection of extract_features: the raw float
    array is unhashable for the driver's canonicalizer, so the checked
    output explodes the exact u32 words to (media_id, dim_idx, u32)."""
    return extract_features(media).select(
        "media_id",
        "kind",
        "n_bytes",
        F.posexplode("u32").alias("dim_idx", "u32"),
    ).withColumn("dim_idx", F.col("dim_idx").cast("int"))


def sample_frames(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame sampling stub: emits one row per sampled frame index
    (duration_ms / every_ms frames, min 1), frame content = digest of
    (hex(payload), idx). Real impl would seek+decode; the row explosion,
    batching and schema are the production shape."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            ids, idxs, shas = [], [], []
            for mid, kind, payload, dur in zip(
                b["media_id"], b["kind"], b["payload"], b["duration_ms"]
            ):
                if kind != "video" or payload is None or dur is None:
                    continue
                hexp = bytes(payload).hex()
                for i in range(max(int(dur) // every_ms, 1)):
                    ids.append(mid)
                    idxs.append(i)
                    shas.append(
                        hashlib.sha256(
                            (hexp + format(i, "08x")).encode()
                        ).hexdigest()
                    )
            yield pd.DataFrame(
                {
                    "media_id": pd.Series(ids, dtype="int64"),
                    "frame_idx": pd.Series(idxs, dtype="int32"),
                    "frame_sha": pd.Series(shas, dtype="object"),
                }
            )

    return media.mapInPandas(run, schema=FRAME_SCHEMA)


PATCH_PX = 16
PATCH_SCHEMA = (
    "media_id long, patch_row int, patch_col int, patch_idx int, "
    "patch_sha string"
)


def patchify(media: DataFrame, patch_px: int = PATCH_PX) -> DataFrame:
    """ViT-prep patch grid: one row per patch of every image, grid =
    ceil(height/patch) × ceil(width/patch), patch content = digest of
    (hex(payload), patch_idx) — the same stub convention as frame
    sampling (a real impl would crop pixel blocks after decode; the row
    explosion, index arithmetic, batching and schema are the production
    shape). Row count scales with image area / patch² — the metadata a
    vision-token budget planner consumes."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            ids, prs, pcs, idxs, shas = [], [], [], [], []
            for mid, kind, payload, w, h in zip(
                b["media_id"], b["kind"], b["payload"], b["width"], b["height"]
            ):
                if kind != "image" or payload is None or w is None or h is None:
                    continue
                hexp = bytes(payload).hex()
                rows = -(-int(h) // patch_px)
                cols = -(-int(w) // patch_px)
                for r in range(rows):
                    for c in range(cols):
                        pi = r * cols + c
                        ids.append(mid)
                        prs.append(r)
                        pcs.append(c)
                        idxs.append(pi)
                        shas.append(
                            hashlib.sha256(
                                (hexp + format(pi, "08x")).encode()
                            ).hexdigest()
                        )
            yield pd.DataFrame(
                {
                    "media_id": pd.Series(ids, dtype="int64"),
                    "patch_row": pd.Series(prs, dtype="int32"),
                    "patch_col": pd.Series(pcs, dtype="int32"),
                    "patch_idx": pd.Series(idxs, dtype="int32"),
                    "patch_sha": pd.Series(shas, dtype="object"),
                }
            )

    return media.mapInPandas(run, schema=PATCH_SCHEMA)


def patchify_sql(n: int = SYNTH_N, patch_px: int = PATCH_PX) -> str:
    """DuckDB twin of patchify(synth_media_df(spark, n)): images are
    i%3==0 with width 64+i%128, height 48+i%96."""
    return f"""
WITH media AS (
  SELECT i AS media_id, repeat(sha256('media:' || i), 4) AS payload_hex,
         64 + i % 128 AS w, 48 + i % 96 AS h
  FROM range({n}) t(i) WHERE i % 3 = 0
), grid AS (
  SELECT media_id, payload_hex,
         ((h + {patch_px} - 1) // {patch_px})::INT AS n_rows,
         ((w + {patch_px} - 1) // {patch_px})::INT AS n_cols
  FROM media
)
SELECT media_id, r::INT AS patch_row, c::INT AS patch_col,
       (r * n_cols + c)::INT AS patch_idx,
       sha256(payload_hex
              || lower(lpad(to_hex(r * n_cols + c), 8, '0'))) AS patch_sha
FROM grid
CROSS JOIN range(16) rr(r)
CROSS JOIN range(16) cc(c)
WHERE r < n_rows AND c < n_cols
"""


def synth_media_df(spark: SparkSession, n: int = SYNTH_N) -> DataFrame:
    """Deterministic synthetic media table for tests: payload =
    sha256('media:{i}') digest ×4 (128 bytes), so its hex string equals
    repeat(sha256('media:'||i), 4) and DuckDB can regenerate it."""
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


def features_sql(n: int = SYNTH_N, dim: int = FEATURE_DIM) -> str:
    """DuckDB twin of features_checked(synth_media_df(spark, n))."""
    return f"""
WITH media AS (
  SELECT i AS media_id,
         CASE i % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END
           AS kind,
         repeat(sha256('media:' || i), 4) AS payload_hex
  FROM range({n}) t(i)
), h AS (
  SELECT media_id, kind, 128::INT AS n_bytes, sha256(payload_hex) AS hh
  FROM media
)
SELECT media_id, kind, n_bytes, d::INT AS dim_idx,
       ('0x' || substring(hh, 8*(d%8)+7, 2) || substring(hh, 8*(d%8)+5, 2)
             || substring(hh, 8*(d%8)+3, 2) || substring(hh, 8*(d%8)+1, 2)
       )::BIGINT AS u32
FROM h CROSS JOIN range({dim}) r(d)
"""


def frames_sql(n: int = SYNTH_N) -> str:
    """DuckDB twin of sample_frames(synth_media_df(spark, n), 1000):
    videos are i%3==2, duration 1000*(1+i%5) → 1+i%5 frames."""
    return f"""
WITH media AS (
  SELECT i AS media_id, repeat(sha256('media:' || i), 4) AS payload_hex
  FROM range({n}) t(i) WHERE i % 3 = 2
)
SELECT media_id, f::INT AS frame_idx,
       sha256(payload_hex || lower(lpad(to_hex(f), 8, '0'))) AS frame_sha
FROM media CROSS JOIN range(5) r(f)
WHERE f < 1 + (media_id % 5)
"""
