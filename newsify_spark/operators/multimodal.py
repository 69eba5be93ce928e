"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata, processed via Arrow-batched ``mapInPandas``.

The decode step is STUBBED (image/audio libs are not in this container):
``decode_image_stub`` produces deterministic fake pixels from the byte
content, and ``decode_image_real`` raises NotImplementedError with the
one-line swap documented. Everything around the stub — schema handling,
batch iteration, partition sizing, output shape — is the real Spark
plumbing a 100 TB multimodal pipeline uses.

Design notes for scale:
- binary payloads ride in their own column so column pruning skips them
  for metadata-only queries (parquet reads the bytes ONLY when the
  feature step needs them);
- mapInPandas streams Arrow batches — peak memory is one batch of
  payloads per core, not one partition;
- feature outputs are fixed-length float arrays -> downstream vector
  operators (similarity, dedup) apply unchanged.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

FEATURE_DIM = 16

MM_SCHEMA = (
    "doc_id bigint, modality string, byte_len bigint, width int, height int, "
    "features array<float>"
)


def attach_binary_payload(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Fixture adapter: treat UTF-8 bytes of the text column as an opaque
    media payload + typed metadata, the shape a real ingest would write."""
    payload = F.encode(text_col, "UTF-8")
    return df.select(
        "doc_id",
        payload.alias("payload"),
        F.lit("image/fake").alias("modality"),
        F.length(payload).cast("long").alias("byte_len"),
    )


def decode_image_stub(buf: bytes) -> np.ndarray:
    """Deterministic fake decode: bytes -> pseudo-pixel grid. Replace with
    PIL/torchvision/cv2 decode in production (see decode_image_real)."""
    arr = np.frombuffer(buf, dtype=np.uint8)
    side = max(int(len(arr) ** 0.5), 1)
    return np.resize(arr, (side, side)).astype(np.float32)


def decode_image_real(buf: bytes):
    raise NotImplementedError(
        "image decode requires PIL/cv2 (not in this container); swap "
        "decode_image_stub -> PIL.Image.open(io.BytesIO(buf)) here"
    )


def image_features(mm: DataFrame, batch_hint: int = 1024) -> DataFrame:
    """binary payload -> fixed-length feature vector via mapInPandas.

    Stub features: 16-bin byte histogram, L1-normalized — deterministic,
    so tests can assert exact invariants. A real model swaps the inner
    loop for a batched forward pass (the Arrow batch IS the model batch).
    """

    def extract(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            feats, widths, heights = [], [], []
            for buf in pdf["payload"]:
                px = decode_image_stub(bytes(buf))
                h, w = px.shape
                hist, _ = np.histogram(px, bins=FEATURE_DIM, range=(0, 256))
                total = hist.sum() or 1
                feats.append((hist / total).astype(np.float32).tolist())
                widths.append(w)
                heights.append(h)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "modality": pdf["modality"],
                    "byte_len": pdf["byte_len"],
                    "width": widths,
                    "height": heights,
                    "features": feats,
                }
            )

    return mm.mapInPandas(extract, schema=MM_SCHEMA)


def resize_images(mm: DataFrame, width: int = 8, height: int = 8) -> DataFrame:
    """Image resize stub: decode -> nearest-neighbor downsample to
    (height, width) -> re-emit as a flat float array. The index math is
    real nearest-neighbor resampling; production swaps the decode +
    interpolation for PIL/cv2 inside the same Arrow batch loop.
    Output: (doc_id, width, height, pixels array<float> len w*h)."""

    def run(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            pixels = []
            for buf in pdf["payload"]:
                px = decode_image_stub(bytes(buf))
                h, w = px.shape
                ys = (np.arange(height) * h // height).clip(0, h - 1)
                xs = (np.arange(width) * w // width).clip(0, w - 1)
                pixels.append(px[np.ix_(ys, xs)].ravel().tolist())
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "width": width,
                    "height": height,
                    "pixels": pixels,
                }
            )

    return mm.mapInPandas(
        run, schema="doc_id bigint, width int, height int, pixels array<float>"
    )


def audio_features(
    mm: DataFrame, frame_len: int = 256, hop: int = 128
) -> DataFrame:
    """Audio feature-extraction stub: payload bytes as signed 8-bit PCM,
    framed (frame_len, hop) -> per-frame RMS energy + zero-crossing
    rate. One row per frame (the one-to-many shape real spectrogram /
    wav2vec front-ends produce); librosa/torchaudio swap into the same
    loop. Output: (doc_id, frame_no, rms double, zcr double).

    Edge contracts: a single-sample frame has no sign transitions, so
    zcr = 0.0 (np.diff over one sample is empty — the mean would be
    NaN); an EMPTY payload yields zero frames, i.e. the doc is absent
    from the output (callers needing presence should left-join back)."""

    def run(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = {"doc_id": [], "frame_no": [], "rms": [], "zcr": []}
            for doc_id, buf in zip(pdf["doc_id"], pdf["payload"]):
                sig = np.frombuffer(bytes(buf), dtype=np.int8).astype(np.float64)
                for n, start in enumerate(range(0, max(len(sig) - frame_len + 1, 1), hop)):
                    fr = sig[start : start + frame_len]
                    if len(fr) == 0:
                        continue
                    rows["doc_id"].append(doc_id)
                    rows["frame_no"].append(n)
                    rows["rms"].append(float(np.sqrt(np.mean(fr * fr))))
                    signs = np.signbit(fr).astype(np.int8)
                    rows["zcr"].append(
                        float(np.mean(np.abs(np.diff(signs)))) if len(fr) > 1 else 0.0
                    )
            yield pd.DataFrame(rows)

    return mm.mapInPandas(
        run, schema="doc_id bigint, frame_no int, rms double, zcr double"
    )


def frame_sample(mm: DataFrame, every_n_bytes: int = 64) -> DataFrame:
    """Video-style frame sampling stub: slice the payload every N bytes
    and emit one row per 'frame' (explode pattern). Exercises the
    one-to-many mapInPandas shape real frame extraction uses."""

    def sample(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = {"doc_id": [], "frame_no": [], "frame_bytes": []}
            for doc_id, buf in zip(pdf["doc_id"], pdf["payload"]):
                b = bytes(buf)
                for i in range(0, len(b), every_n_bytes):
                    rows["doc_id"].append(doc_id)
                    rows["frame_no"].append(i // every_n_bytes)
                    rows["frame_bytes"].append(b[i : i + every_n_bytes])
            yield pd.DataFrame(rows)

    return mm.mapInPandas(sample, schema="doc_id bigint, frame_no int, frame_bytes binary")
