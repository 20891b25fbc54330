"""Multimodal (image/audio/video) column plumbing.

Not in the reference (text-only crawler); part of the training-data
pipeline surface.  Media travel as opaque ``binary`` columns with typed
metadata; all per-item work runs as Arrow-batched ``mapInPandas``
kernels, so the Spark-side plumbing — schema, partitioning, batch shape
— is real and tested even though the actual codecs are not installed in
this container.

Decoders are pluggable: the default is :func:`fake_decoder`, a
deterministic content-hash feature extractor (stable across partitions
and reruns — usable in tests and as a cheap corpus fingerprint).  A
real decoder (PIL/ffmpeg) slots into the same signature; requesting one
without the library installed raises ``NotImplementedError`` at plan
build time, not mid-job on an executor.
"""

from __future__ import annotations

import hashlib
from collections.abc import Callable, Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, functions as F

#: canonical media relation: (doc_id, media_type, meta..., data binary)
MEDIA_SCHEMA = (
    "doc_id long, media_type string, width int, height int, "
    "duration_ms int, data binary"
)

FEATURE_DIM = 64

FEATURES_SCHEMA = (
    "doc_id long, media_type string, n_bytes int, payload_sha256 string, "
    "features array<float>"
)


def fake_decoder(data: pd.Series) -> np.ndarray:
    """Deterministic stand-in decode+featurize: bytes -> FEATURE_DIM floats.

    sha256 of the payload expanded to a unit vector — stable, cheap, and
    exercises the exact batch shapes a real CNN/fbank extractor would.
    """
    out = np.empty((len(data), FEATURE_DIM), dtype=np.float32)
    for i, buf in enumerate(data):
        h = hashlib.sha256(bytes(buf or b"")).digest()
        raw = np.frombuffer((h * ((FEATURE_DIM * 4) // len(h) + 1))[: FEATURE_DIM * 4], dtype=np.uint32)
        v = raw.astype(np.float32) / np.float32(2**32)
        out[i] = v / (np.linalg.norm(v) or 1.0)
    return out


def real_decoder(media_type: str) -> Callable[[pd.Series], np.ndarray]:
    """Return a real decoder for ``media_type``; raises if libs absent.

    Import check happens on the driver so a missing codec fails fast
    (not mid-job on an executor).  With Pillow installed the image
    branch returns a thumbnail-features decoder matching the
    :func:`fake_decoder` signature and FEATURE_DIM.
    """
    if media_type == "image":
        try:
            import PIL.Image  # noqa: F401
        except ImportError as exc:
            raise NotImplementedError(
                "image decode requires Pillow (not installed in this "
                "container); pass decoder=fake_decoder for plumbing tests"
            ) from exc

        def _pil_decode(data: pd.Series) -> np.ndarray:
            import io

            from PIL import Image

            side = int(FEATURE_DIM**0.5)  # 8x8 grayscale thumbnail
            out = np.zeros((len(data), FEATURE_DIM), dtype=np.float32)
            for i, buf in enumerate(data):
                img = Image.open(io.BytesIO(bytes(buf))).convert("L")
                img = img.resize((side, side))
                v = np.asarray(img, dtype=np.float32).reshape(-1) / 255.0
                out[i] = v / (np.linalg.norm(v) or 1.0)
            return out

        return _pil_decode
    if media_type in ("audio", "video"):
        raise NotImplementedError(
            f"{media_type} decode requires ffmpeg bindings (not installed)"
        )
    raise NotImplementedError(f"no decoder for media_type={media_type!r}")


def extract_features(
    media: DataFrame,
    decoder: Callable[[pd.Series], np.ndarray] = fake_decoder,
    batch_rows: int = 256,
) -> DataFrame:
    """media relation -> (doc_id, media_type, n_bytes, features).

    ``mapInPandas`` over Arrow batches; the kernel re-chunks each batch
    to ``batch_rows`` so decoder peak memory is bounded by
    ``batch_rows x item_size`` regardless of
    ``spark.sql.execution.arrow.maxRecordsPerBatch``.  Partitioning is
    preserved (narrow op — no shuffle); repartition upstream if item
    sizes are skewed.
    """

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for lo in range(0, len(pdf), batch_rows):
                chunk = pdf.iloc[lo: lo + batch_rows]
                feats = decoder(chunk["data"])
                # payload_sha256 is hashed from the exact bytes the
                # decoder saw — an end-to-end Arrow byte-fidelity check
                # the SQL oracle can recompute (driver hash-match)
                yield pd.DataFrame(
                    {
                        "doc_id": chunk["doc_id"].values,
                        "media_type": chunk["media_type"].values,
                        "n_bytes": chunk["data"].map(lambda b: len(b or b"")).astype("int32").values,
                        "payload_sha256": chunk["data"].map(
                            lambda b: hashlib.sha256(bytes(b or b"")).hexdigest()
                        ).values,
                        "features": list(feats),
                    }
                )

    return media.select("doc_id", "media_type", "data").mapInPandas(
        kernel, schema=FEATURES_SCHEMA
    )


def sample_frames(
    media: DataFrame, every_ms: int = 1000
) -> DataFrame:
    """Video -> (doc_id, frame_idx, frame_ts_ms) sampling plan.

    The *schedule* is pure Catalyst (sequence + explode over the typed
    ``duration_ms`` metadata — no Python, no decode); the frame pixel
    extraction itself would be an ``extract_features`` pass with a video
    decoder plugged in.
    """
    return (
        media.where(F.col("media_type") == "video")
        .select(
            "doc_id",
            F.posexplode(
                F.sequence(
                    F.lit(0),
                    F.greatest(F.col("duration_ms") - 1, F.lit(0)),
                    F.lit(every_ms),
                )
            ).alias("frame_idx", "frame_ts_ms"),
        )
    )


def synthetic_media(spark, n_items: int = 64, seed: int = 42) -> DataFrame:
    """Deterministic fake media table matching MEDIA_SCHEMA (tests)."""
    rng = np.random.default_rng(seed)
    rows = []
    for i in range(n_items):
        mt = ["image", "audio", "video"][i % 3]
        payload = rng.integers(0, 256, size=int(rng.integers(64, 512)), dtype=np.uint8).tobytes()
        rows.append(
            (
                i,
                mt,
                int(rng.integers(16, 1920)) if mt == "image" else 0,
                int(rng.integers(16, 1080)) if mt == "image" else 0,
                int(rng.integers(1000, 60000)) if mt in ("audio", "video") else 0,
                bytearray(payload),
            )
        )
    return spark.createDataFrame(rows, schema=MEDIA_SCHEMA)
