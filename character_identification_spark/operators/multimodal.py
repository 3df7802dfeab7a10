"""Multimodal payload plumbing: opaque binary columns + typed metadata.

Images/audio/video ride through the engine as ``binary`` payloads with a
typed metadata struct; decode / feature-extract / resize / frame-sample are
``mapInPandas`` stages (Arrow batches of bytes → numpy). The image/audio
codec libraries are NOT in this container, so the codec call itself is
stubbed: ``decoder="fake"`` is a deterministic pure function of the bytes
(real Spark plumbing, fake pixels), ``decoder="pil"`` raises
NotImplementedError unless PIL is importable. Everything around the codec —
schema, batch shape, partitioning, determinism — is real and tested.

MEDIA_SCHEMA is the canonical table shape:
  media(media_id long, url string, kind string,       -- image|audio|video
        payload binary, meta struct<width int, height int, frames int,
        sample_rate int, mime string>)
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "media_id long, url string, kind string, payload binary, "
    "meta struct<width:int, height:int, frames:int, sample_rate:int, mime:string>"
)

FEATURE_DIM = 16

_FEATURE_SCHEMA = (
    "media_id long, kind string, n_bytes int, digest string, "
    f"features array<float>"
)


def _fake_decode(payload: bytes) -> np.ndarray:
    """Deterministic stand-in for a codec: md5-seeded pseudo-features.
    Pure function of the bytes — the multimodal analog of the hash-seeded
    embedding rule (SURVEY.md §7.3)."""
    dig = hashlib.md5(payload).digest()
    raw = np.frombuffer((dig * ((FEATURE_DIM * 4) // len(dig) + 1))[: FEATURE_DIM * 4], dtype="<u4")
    return (raw.astype(np.float64) / 2**32).astype(np.float32)


def _real_decode(payload: bytes) -> np.ndarray:  # pragma: no cover - needs PIL
    try:
        import io

        from PIL import Image  # noqa: F401
    except ImportError as e:
        raise NotImplementedError(
            "real image decode needs PIL, which is not installed in this "
            "container; use decoder='fake' (deterministic stub) instead"
        ) from e
    img = Image.open(io.BytesIO(payload)).convert("L").resize((4, 4))
    return (np.asarray(img, dtype=np.float32) / 255.0).reshape(-1)


def extract_media_features(media: DataFrame, decoder: str = "fake") -> DataFrame:
    """media → (media_id, kind, n_bytes, digest, features array<float>).

    One Arrow batch in/out per partition; the decode loop is per-item (a
    codec is inherently per-item) but batch-amortized — no per-row UDF
    serde. Partition count of the input is preserved."""
    decode = {"fake": _fake_decode, "pil": _real_decode}[decoder]

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, kinds, sizes, digs, feats = [], [], [], [], []
            for mid, kind, payload in zip(pdf["media_id"], pdf["kind"], pdf["payload"]):
                b = bytes(payload) if payload is not None else b""
                ids.append(mid)
                kinds.append(kind)
                sizes.append(len(b))
                digs.append(hashlib.md5(b).hexdigest())
                feats.append(decode(b).tolist())
            yield pd.DataFrame(
                {"media_id": ids, "kind": kinds, "n_bytes": sizes,
                 "digest": digs, "features": feats}
            )

    return media.select("media_id", "kind", "payload").mapInPandas(fn, _FEATURE_SCHEMA)


def frame_sample_plan(media: DataFrame, every_n: int = 10) -> DataFrame:
    """Video → one row per sampled frame index (planning stage: which
    frames a decoder would materialize). Pure relational fan-out from the
    metadata — the expensive byte-level sampling stays in the mapInPandas
    stage that consumes this plan."""
    return (
        media.filter(F.col("kind") == "video")
        .select(
            "media_id",
            F.explode(
                F.sequence(
                    F.lit(0),
                    F.greatest(F.col("meta.frames") - 1, F.lit(0)),
                    F.lit(every_n),
                )
            ).alias("frame_idx"),
        )
    )


def synthetic_media(spark, n: int = 24, seed: int = 7) -> DataFrame:
    """Deterministic fixture: binary payloads derived from md5(seed,i).

    The payload bytes are the ASCII hexdigest repeated (not raw digest
    bytes) so the DuckDB oracle can recompute md5(payload) — DuckDB's md5
    only accepts VARCHAR. The engine still treats it as opaque binary."""
    rows = []
    kinds = ["image", "audio", "video"]
    for i in range(n):
        payload = hashlib.md5(f"{seed}|{i}".encode()).hexdigest().encode() * (i % 5 + 1)
        kind = kinds[i % 3]
        meta = {
            "width": 64 + i if kind == "image" else None,
            "height": 48 + i if kind == "image" else None,
            "frames": 30 * (i + 1) if kind == "video" else None,
            "sample_rate": 16000 if kind == "audio" else None,
            "mime": {"image": "image/png", "audio": "audio/wav", "video": "video/mp4"}[kind],
        }
        rows.append((i, f"https://media.test/{i}", kind, payload, meta))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)
