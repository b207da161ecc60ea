"""Multimodal column plumbing: image/audio/video as opaque binary.

The Spark-side machinery (schema, partitioning, Arrow batch shape, UDF
signatures) is real and tested; the actual codec work is STUBBED behind
``decode_fn`` hooks because image/audio libraries are not in this
container — swap in PIL/torchaudio decoders in production. The
deterministic fake decoder lets tests assert the full pipeline shape.

Design for 100 TB: binary payloads ride in their own column so column
pruning keeps metadata-only queries from touching bytes; feature
extraction is mapInPandas (Arrow-batched, one Python worker per core),
and `spark.sql.files.maxPartitionBytes` bounds per-task bytes.
"""

from __future__ import annotations

import hashlib
from typing import Callable, Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F, types as T

MEDIA_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType(), False),
    T.StructField("kind", T.StringType(), False),        # image|audio|video
    T.StructField("mime", T.StringType(), True),
    T.StructField("width", T.IntegerType(), True),
    T.StructField("height", T.IntegerType(), True),
    T.StructField("duration_ms", T.LongType(), True),
    T.StructField("payload", T.BinaryType(), True),      # opaque bytes
])


def fake_decode_image(payload: bytes, width: int, height: int) -> np.ndarray:
    """Deterministic stand-in for a real image decoder: derive pixels
    from sha256(payload). Replace with PIL in production."""
    seed = int.from_bytes(hashlib.sha256(payload).digest()[:8], "big")
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, size=(height, width, 3), dtype=np.uint8)


def real_decode_image(payload: bytes, width: int, height: int) -> np.ndarray:
    raise NotImplementedError(
        "image codec not available in this environment; install pillow and "
        "replace decode_fn (e.g. np.asarray(Image.open(io.BytesIO(payload))))"
    )


def image_features(
    df: DataFrame,
    decode_fn: Callable[[bytes, int, int], np.ndarray] = fake_decode_image,
    thumb: int = 8,
) -> DataFrame:
    """Decode -> resize(thumb x thumb, mean-pool) -> channel stats.
    Output: (media_id, mean_r, mean_g, mean_b, thumb: array<float>)."""

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"media_id": [], "mean_r": [], "mean_g": [], "mean_b": [], "thumb": []}
            for row in pdf.itertuples(index=False):
                img = decode_fn(bytes(row.payload), int(row.width), int(row.height))
                h, w, _ = img.shape
                # mean-pool resize to thumb x thumb — vectorized with
                # reduceat over both axes (one pass, no per-cell loop)
                ys = np.linspace(0, h, thumb + 1, dtype=int)
                xs = np.linspace(0, w, thumb + 1, dtype=int)
                if (np.diff(ys) > 0).all() and (np.diff(xs) > 0).all():
                    row_sum = np.add.reduceat(
                        img.astype(np.float64), ys[:-1], axis=0)
                    cell_sum = np.add.reduceat(row_sum, xs[:-1], axis=1)
                    counts = np.outer(np.diff(ys), np.diff(xs))
                    small = cell_sum / counts[:, :, None]
                else:
                    # degenerate tiny images (h or w < thumb): per-cell
                    # fallback keeps empty-patch semantics identical
                    small = np.zeros((thumb, thumb, 3), dtype=np.float64)
                    for i in range(thumb):
                        for j in range(thumb):
                            patch = img[ys[i]:ys[i + 1], xs[j]:xs[j + 1]]
                            small[i, j] = patch.mean(axis=(0, 1))
                out["media_id"].append(row.media_id)
                m = img.mean(axis=(0, 1))
                out["mean_r"].append(float(m[0]))
                out["mean_g"].append(float(m[1]))
                out["mean_b"].append(float(m[2]))
                out["thumb"].append(small.mean(axis=2).ravel().astype(np.float32))
            yield pd.DataFrame(out)

    return df.select("media_id", "width", "height", "payload").mapInPandas(
        extract,
        schema="media_id long, mean_r double, mean_g double, mean_b double, "
               "thumb array<float>",
    )


def frame_sample(
    df: DataFrame, every_ms: int = 1000
) -> DataFrame:
    """Video frame-sampling plan: one output row per sampled timestamp.
    The decode itself is stubbed; the EXPLODE + timestamp math is the
    real Spark plumbing (posexplode over a generated sequence)."""
    n_frames = F.greatest(
        (F.col("duration_ms") / F.lit(every_ms)).cast("int"), F.lit(1)
    )
    return (
        df.filter(F.col("kind") == "video")
        .withColumn("frame_idx", F.explode(F.sequence(F.lit(0), n_frames - 1)))
        .withColumn("frame_ts_ms", F.col("frame_idx") * F.lit(every_ms))
        .select("media_id", "frame_idx", "frame_ts_ms", "payload")
    )


def generate_media(spark, n: int = 64, seed: int = 42) -> DataFrame:
    """Deterministic synthetic media table for tests."""
    rng = np.random.default_rng(seed)
    rows = []
    kinds = ["image", "audio", "video"]
    for i in range(n):
        kind = kinds[i % 3]
        payload = rng.bytes(64)
        rows.append((
            i, kind,
            {"image": "image/png", "audio": "audio/wav", "video": "video/mp4"}[kind],
            int(rng.integers(4, 64)) if kind == "image" else None,
            int(rng.integers(4, 64)) if kind == "image" else None,
            int(rng.integers(1000, 10000)) if kind != "image" else None,
            payload,
        ))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def fake_decode_audio(payload: bytes, duration_ms: int,
                      sample_rate: int = 16000) -> np.ndarray:
    """Deterministic fake PCM decode (hash-seeded), same contract a
    torchaudio/librosa decoder would satisfy: 1-D float32 samples."""
    import hashlib

    seed = int.from_bytes(hashlib.sha256(payload).digest()[:8], "big")
    n = max(int(duration_ms * sample_rate / 1000), 1)
    rng = np.random.default_rng(seed)
    return rng.standard_normal(min(n, 160_000)).astype(np.float32)


def audio_features(
    df: DataFrame,
    decode_fn=fake_decode_audio,
    n_bands: int = 8,
    frame: int = 512,
) -> DataFrame:
    """Audio feature extraction over binary payloads: decode ->
    frame -> per-band energy (a spectrogram-shaped summary) + rms /
    zero-crossing-rate — the torchaudio-style pipeline with the codec
    stubbed (see module docstring), everything else real: Arrow
    batches in, fixed-size float arrays out, vectorized numpy inside.

    Returns (media_id, rms double, zcr double,
    band_energy array<float>). Frames are grouped into ``n_bands``
    contiguous bands by reshape+mean — no Python loops per sample."""
    out_schema = ("media_id long, rms double, zcr double, "
                  "band_energy array<float>")

    def extract(batches):
        for pdf in batches:
            if pdf.empty:
                continue
            ids, rms, zcr, bands = [], [], [], []
            for mid, payload, dur in zip(
                    pdf["media_id"], pdf["payload"], pdf["duration_ms"]):
                x = decode_fn(bytes(payload), int(dur))
                n = (len(x) // frame) * frame
                if n == 0:
                    x = np.pad(x, (0, frame - len(x)))
                    n = frame
                fr = x[:n].reshape(-1, frame)
                energy = (fr * fr).mean(axis=1)
                k = len(energy) // n_bands
                if k == 0:
                    energy = np.pad(energy, (0, n_bands - len(energy)))
                    k = 1
                be = energy[: k * n_bands].reshape(n_bands, k).mean(axis=1)
                ids.append(mid)
                rms.append(float(np.sqrt((x * x).mean())))
                zcr.append(float((np.diff(np.signbit(x)) != 0).mean()))
                bands.append(be.astype(np.float32))
            yield pd.DataFrame({
                "media_id": ids, "rms": rms, "zcr": zcr,
                "band_energy": bands,
            })

    return (
        df.filter(F.col("kind") == "audio")
        .select("media_id", "payload", "duration_ms")
        .mapInPandas(extract, schema=out_schema)
    )
