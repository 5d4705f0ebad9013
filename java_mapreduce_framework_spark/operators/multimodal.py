"""Multimodal column handling (SURVEY.md M5): image/audio/video as
opaque ``binary`` payloads with typed metadata, processed with
Arrow-batched ``mapInPandas``.

The container ships no image/audio libraries, so the *decode kernels*
are deliberate stubs (deterministic fakes, or NotImplementedError for
the real-library path) -- but the Spark-side plumbing is real and
tested: schema, batch iteration, partition-preserving metadata
extraction, and frame-sampling explosion. Swapping a stub for
PIL/librosa changes only the kernel body.

100 TB posture: payloads stay in executor-side Arrow batches; nothing
returns to the driver; per-batch memory is bounded by
``spark.sql.execution.arrow.maxRecordsPerBatch``.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: Output schema of decode_metadata (DDL form, used by mapInPandas).
DECODE_SCHEMA = (
    "doc_id long, content_type string, n_bytes long, fake_width long, fake_height long, "
    "byte_sum long, byte_min int, byte_max int, n_distinct_bytes int"
)

FRAME_SCHEMA = "doc_id long, frame_idx int, frame_bytes binary"


def attach_payload(documents: DataFrame) -> DataFrame:
    """Model a multimodal table: derive an opaque binary payload column
    (UTF-8 bytes of the text stand in for image bytes) plus typed
    metadata, the canonical layout for binary + metadata columns."""
    return documents.select(
        "doc_id",
        F.encode("text", "UTF-8").alias("payload"),
        F.lit("image/fake").alias("content_type"),
    )


def _fake_decode(payload: bytes) -> tuple[int, int, int]:
    """Deterministic stand-in for an image decoder: derives fake
    dimensions from the byte length. Replace with PIL decode when the
    library is available."""
    n = len(payload)
    return n, n % 640, (n * 7) % 480


def real_decode(payload: bytes):  # pragma: no cover - stub by design
    """Real image decode -- STUB. The execution container has no
    imaging libraries; the Arrow plumbing around this kernel is what
    the engine provides."""
    try:
        from PIL import Image  # noqa: F401
    except ImportError as e:
        raise NotImplementedError(
            "image decode requires Pillow, not present in this environment; "
            "use _fake_decode for plumbing tests"
        ) from e
    raise NotImplementedError("wire PIL Image.open(io.BytesIO(payload)) here")


def decode_metadata(multimodal: DataFrame) -> DataFrame:
    """Per-payload metadata extraction via mapInPandas: batch iterator
    in, batch iterator out, payload column dropped on output so the
    binary never travels further than necessary.

    Alongside the fake-decoder dimensions, emits content-derived byte
    statistics (sum / min / max / distinct count over the raw payload
    bytes, numpy-vectorized) so the correctness oracle verifies actual
    payload CONTENT, not just its length."""
    import numpy as np

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            decoded = [_fake_decode(p) for p in pdf["payload"]]
            stats = []
            for p in pdf["payload"]:
                if len(p):
                    x = np.frombuffer(p, dtype=np.uint8)
                    stats.append(
                        (int(x.sum(dtype=np.int64)), int(x.min()), int(x.max()),
                         int(len(np.unique(x))))
                    )
                else:
                    stats.append((0, 0, 0, 0))
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].astype("int64"),
                    "content_type": pdf["content_type"],
                    "n_bytes": pd.Series([d[0] for d in decoded], dtype="int64"),
                    "fake_width": pd.Series([d[1] for d in decoded], dtype="int64"),
                    "fake_height": pd.Series([d[2] for d in decoded], dtype="int64"),
                    "byte_sum": pd.Series([s[0] for s in stats], dtype="int64"),
                    "byte_min": pd.Series([s[1] for s in stats], dtype="int32"),
                    "byte_max": pd.Series([s[2] for s in stats], dtype="int32"),
                    "n_distinct_bytes": pd.Series([s[3] for s in stats], dtype="int32"),
                }
            )

    return multimodal.mapInPandas(kernel, schema=DECODE_SCHEMA)


def frame_sample(multimodal: DataFrame, max_frames: int = 4, frame_bytes: int = 32) -> DataFrame:
    """Video-style frame sampling: explode each payload into up to
    ``max_frames`` fixed-stride byte slices (stand-ins for decoded
    frames). Real frame decode would replace the slicing kernel."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, blobs = [], [], []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                n_frames = min(max_frames, max(1, len(payload) // frame_bytes))
                stride = max(1, len(payload) // n_frames)
                for i in range(n_frames):
                    ids.append(doc_id)
                    idxs.append(i)
                    blobs.append(bytes(payload[i * stride : i * stride + frame_bytes]))
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(ids, dtype="int64"),
                    "frame_idx": pd.Series(idxs, dtype="int32"),
                    "frame_bytes": blobs,
                }
            )

    return multimodal.mapInPandas(kernel, schema=FRAME_SCHEMA)


RESIZE_SCHEMA = "doc_id long, out_width long, out_height long, resized binary"


def resize(multimodal: DataFrame, target_width: int = 64) -> DataFrame:
    """Image-style resize over opaque payloads: emits a downscaled
    payload plus its new fake dimensions. The kernel is a
    deterministic stub (byte-stride downsample standing in for a real
    interpolating resampler -- Pillow is absent by design); the
    engine-relevant parts are real: Arrow batch iteration, binary in /
    binary out, 1:1 row contract, metadata riding alongside the blob.
    Replace the slicing with ``PIL.Image.resize`` when the library
    exists.

    100 TB posture: resize is the canonical pre-shuffle size reducer
    -- run it BEFORE any repartition/join of a multimodal table so the
    exchange carries thumbnails, not originals.
    """

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, ws, hs, outs = [], [], [], []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                _, w, h = _fake_decode(payload)
                scale = max(1, w // target_width)
                ids.append(doc_id)
                ws.append(max(1, w // scale))
                hs.append(max(1, h // scale))
                outs.append(bytes(payload[::scale]))
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(ids, dtype="int64"),
                    "out_width": pd.Series(ws, dtype="int64"),
                    "out_height": pd.Series(hs, dtype="int64"),
                    "resized": outs,
                }
            )

    return multimodal.mapInPandas(kernel, schema=RESIZE_SCHEMA)


AUDIO_SCHEMA = (
    "doc_id long, n_samples long, duration_fake_ms double, rms_fake double, peak_fake double"
)


def audio_features(multimodal: DataFrame, sample_rate: int = 16000) -> DataFrame:
    """Audio-style feature extraction over opaque binary payloads:
    interpret bytes as fake PCM samples and emit per-clip stats
    (sample count, duration, RMS, peak). The DSP kernel is a
    deterministic stub -- librosa/scipy are absent by design -- but
    the batch shape is the real one: one Arrow batch in, one stats
    frame out, payload dropped on output. Swapping in a real decoder
    changes only the numpy body.

    RMS and peak are content-derived (oracle-verified byte-for-byte);
    duration is reported in milliseconds (n / (rate/1000)) because a
    power-of-two divisor is exact in float64, making the value
    engine-portable without rounding-mode ties."""
    import numpy as np

    ms_divisor = sample_rate / 1000.0

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, counts, durs, rms, peak = [], [], [], [], []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                x = np.frombuffer(payload, dtype=np.uint8).astype(np.float64) - 128.0
                ids.append(doc_id)
                counts.append(len(x))
                durs.append(len(x) / ms_divisor)
                rms.append(round(float(np.sqrt(np.mean(x * x))) if len(x) else 0.0, 4))
                peak.append(round(float(np.abs(x).max()) if len(x) else 0.0, 4))
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(ids, dtype="int64"),
                    "n_samples": pd.Series(counts, dtype="int64"),
                    "duration_fake_ms": pd.Series(durs, dtype="float64"),
                    "rms_fake": pd.Series(rms, dtype="float64"),
                    "peak_fake": pd.Series(peak, dtype="float64"),
                }
            )

    return multimodal.mapInPandas(kernel, schema=AUDIO_SCHEMA)
