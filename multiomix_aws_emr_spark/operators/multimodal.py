"""Multimodal column plumbing: opaque binary payloads + typed metadata.

North-star requirement: image/audio/video travel as ``binary`` columns
with a metadata struct; decode / feature-extract run as Arrow-batched
``mapInPandas`` over the binary bytes. The actual media codecs are NOT in
this container, so the decode step is stubbed two ways (clearly marked):

- :func:`decode_media` raises ``NotImplementedError`` — the seam where a
  real codec (Pillow/ffmpeg/torchaudio) plugs in;
- :func:`byte_histogram_features` is a deterministic stand-in feature
  extractor (16-bucket byte histogram via NumPy) that keeps the full
  Spark-side contract REAL and testable: schema, Arrow batch shape,
  partitioning, UDF signature.

At 100 TB the payload column dominates I/O: keep binaries in their own
parquet column (columnar pruning skips them unless selected), never
groupBy/shuffle on payload bytes (shuffle on doc ids; payloads only move
through mapInPandas pipelines), and size Arrow batches down
(``spark.sql.execution.arrow.maxRecordsPerBatch``) when payloads are MBs.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_N_BUCKETS = 16


def attach_binary_payload(
    df: DataFrame, *, id_col: str, text_col: str
) -> DataFrame:
    """Simulate a media table from the documents fixture: payload =
    utf-8 bytes of the text (deterministic), plus a typed metadata struct
    — the schema shape a real ingest would produce."""
    payload = F.encode(F.col(text_col), "UTF-8")
    meta = F.struct(
        F.octet_length(payload).alias("n_bytes"),
        F.lit("text/plain").alias("mime"),
        F.lit("fake-media-v0").alias("codec"),
    )
    return df.select(
        F.col(id_col), payload.alias("payload"), meta.alias("meta")
    )


def decode_media(payload: bytes, mime: str) -> "np.ndarray":
    """Real media decode — NOT implemented in this container (no image/
    audio libs are baked in). Plug a codec in here; everything downstream
    (schema, batching, partitioning) already works against the fake
    extractor below."""
    raise NotImplementedError(
        "media codecs are not available in this environment; "
        "use byte_histogram_features or inject a decoder"
    )


def _histogram_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        ids, n_bytes, hists = [], [], []
        for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
            buf = np.frombuffer(bytes(payload), dtype=np.uint8)
            hist = np.bincount(buf >> 4, minlength=_N_BUCKETS)[:_N_BUCKETS]
            ids.append(doc_id)
            n_bytes.append(len(buf))
            hists.append(hist.astype("int64").tolist())
        yield pd.DataFrame(
            {"doc_id": ids, "n_bytes": n_bytes, "features": hists}
        )


def byte_histogram_features(media: DataFrame) -> DataFrame:
    """Deterministic fake feature extraction over the binary payload via
    Arrow-batched ``mapInPandas`` — the real plumbing a decoder would use.
    Output: (doc_id, n_bytes, features array<bigint>[16])."""
    return media.select("doc_id", "payload").mapInPandas(
        _histogram_batches,
        schema="doc_id bigint, n_bytes int, features array<bigint>",
    )


_RESIZE_CAP = 256


def _resize_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        out_ids, out_payloads, out_n = [], [], []
        for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
            buf = bytes(payload)[:_RESIZE_CAP]  # stand-in for a real resample
            out_ids.append(doc_id)
            out_payloads.append(buf)
            out_n.append(len(buf))
        yield pd.DataFrame(
            {"doc_id": out_ids, "payload_resized": out_payloads, "n_bytes_resized": out_n}
        )


def resize_media(media: DataFrame) -> DataFrame:
    """'Resize' each payload via Arrow-batched ``mapInPandas``.

    The transform itself is a deterministic stand-in (truncate to
    ``_RESIZE_CAP`` bytes — a real implementation decodes, resamples with
    an image lib, and re-encodes at :func:`decode_media`'s seam); the
    Spark-side contract — binary-in/binary-out schema, Arrow batching,
    narrow per-partition execution with no shuffle — is the real one.
    Output: (doc_id, payload_resized binary, n_bytes_resized int).
    """
    return media.select("doc_id", "payload").mapInPandas(
        _resize_batches,
        schema="doc_id bigint, payload_resized binary, n_bytes_resized int",
    )


_FRAME_BYTES = 64


def _frame_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        ids, idxs, frames = [], [], []
        for doc_id, payload, stride in zip(
            pdf["doc_id"], pdf["payload"], pdf["stride"]
        ):
            buf = bytes(payload)
            n_frames = max(1, len(buf) // _FRAME_BYTES)
            for fi in range(0, n_frames, int(stride)):
                ids.append(doc_id)
                idxs.append(fi)
                frames.append(buf[fi * _FRAME_BYTES : (fi + 1) * _FRAME_BYTES])
        yield pd.DataFrame({"doc_id": ids, "frame_idx": idxs, "frame": frames})


def sample_frames(media: DataFrame, *, stride: int = 4) -> DataFrame:
    """Sample every ``stride``-th fixed-size 'frame' from each payload —
    the row-expanding (1 -> N) shape of video frame extraction, via
    ``mapInPandas`` so one input batch yields many output rows without a
    Python UDTF. Frames here are byte slices (``_FRAME_BYTES`` each); a
    real demuxer plugs in at :func:`decode_media`'s seam.
    Output: (doc_id, frame_idx int, frame binary)."""
    return media.select(
        "doc_id", "payload", F.lit(stride).alias("stride")
    ).mapInPandas(
        _frame_batches, schema="doc_id bigint, frame_idx int, frame binary"
    )
