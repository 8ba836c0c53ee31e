"""Multimodal column plumbing: opaque binary payloads + typed metadata.

North-star requirement: image/audio/video travel as ``binary`` columns
with a metadata struct; decode / feature-extract run as Arrow-batched
``mapInPandas`` over the binary bytes. Decode is REAL for the formats the
stdlib can express — :mod:`operators.codecs` implements PPM (P6) and
24-bit BMP from their public specs and registers them by mime type;
:func:`decode_media` dispatches through that registry, and
:func:`resize_media` genuinely decodes -> nearest-neighbor-resamples ->
re-encodes any payload whose mime is registered. Compressed codecs
(JPEG/PNG/ffmpeg) are not in this container; for an UNREGISTERED mime:

- :func:`decode_media` raises ``NotImplementedError`` — the seam where a
  real codec (Pillow/ffmpeg/torchaudio) plugs in is registering its mime
  in ``codecs.DECODERS``;
- :func:`byte_histogram_features` is a deterministic byte-level feature
  extractor (16-bucket byte histogram via NumPy) that keeps the full
  Spark-side contract REAL and testable: schema, Arrow batch shape,
  partitioning, UDF signature;
- :func:`resize_media` falls back to byte truncation.

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
    """Decode a media payload to an (h, w, 3) uint8 array via the codec
    registry (:mod:`operators.codecs` — PPM and BMP decode for real from
    their public specs). Unregistered mimes (JPEG/PNG/video — their codecs
    are not baked into this container) raise ``NotImplementedError``:
    plugging in a real library means registering its mime in
    ``codecs.DECODERS``, not editing this function."""
    from multiomix_aws_emr_spark.operators.codecs import DECODERS

    decoder = DECODERS.get(mime)
    if decoder is None:
        raise NotImplementedError(
            f"no decoder registered for mime {mime!r}; register one in "
            "operators.codecs.DECODERS (PPM/BMP ship built-in)"
        )
    return decoder(bytes(payload))


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
_RESIZE_W = 4
_RESIZE_H = 4


def _resize_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    from multiomix_aws_emr_spark.operators.codecs import (
        DECODERS,
        ENCODERS,
        nn_resize,
    )

    for pdf in batches:
        out_ids, out_payloads, out_n = [], [], []
        for doc_id, payload, mime in zip(
            pdf["doc_id"], pdf["payload"], pdf["mime"]
        ):
            raw = bytes(payload)
            decoder = DECODERS.get(mime)
            if decoder is not None:
                # the genuine path: decode -> resample -> re-encode
                img = decoder(raw)
                small = nn_resize(img, _RESIZE_W, _RESIZE_H)
                buf = ENCODERS[mime](small)
            else:
                # undecodable mime: deterministic byte-level stand-in
                buf = raw[:_RESIZE_CAP]
            out_ids.append(doc_id)
            out_payloads.append(buf)
            out_n.append(len(buf))
        yield pd.DataFrame(
            {"doc_id": out_ids, "payload_resized": out_payloads, "n_bytes_resized": out_n}
        )


def resize_media(media: DataFrame) -> DataFrame:
    """Resize each payload via Arrow-batched ``mapInPandas``.

    Payloads whose ``meta.mime`` has a registered codec take the genuine
    path: decode -> nearest-neighbor resample to 4x4 -> re-encode
    (:mod:`operators.codecs`). Unregistered mimes fall back to a
    deterministic byte truncation (``_RESIZE_CAP``) so the operator stays
    total. Either way the Spark-side contract — binary-in/binary-out
    schema, Arrow batching, narrow per-partition execution with no
    shuffle — is the real one.
    Output: (doc_id, payload_resized binary, n_bytes_resized int).
    """
    return media.select(
        "doc_id", "payload", F.col("meta.mime").alias("mime")
    ).mapInPandas(
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


_SYNTH_W = 8
_SYNTH_H = 8


def _synth_ppm_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    from multiomix_aws_emr_spark.operators.codecs import ppm_encode

    n_px = _SYNTH_W * _SYNTH_H * 3
    idx = np.arange(n_px, dtype=np.int64)
    for pdf in batches:
        ids, payloads = [], []
        for doc_id in pdf["doc_id"]:
            # pixel bytes are a CLOSED-FORM function of doc_id so decoded
            # statistics stay SQL-computable by the DuckDB oracle
            data = ((int(doc_id) * 31 + idx) % 256).astype(np.uint8)
            img = data.reshape(_SYNTH_H, _SYNTH_W, 3)
            ids.append(doc_id)
            payloads.append(ppm_encode(img))
        yield pd.DataFrame({"doc_id": ids, "payload": payloads})


def synthesize_ppm_media(df: DataFrame, *, id_col: str) -> DataFrame:
    """Render a deterministic 8x8 PPM image per row (pixel i of doc d is
    ``(d*31 + i) % 256``) — a REAL encoded image the registry can decode,
    with closed-form pixel values an external SQL engine can recompute.
    Output: (doc_id, payload binary, meta struct<n_bytes,mime,codec>)."""
    from multiomix_aws_emr_spark.operators.codecs import MIME_PPM

    rendered = df.select(F.col(id_col).alias("doc_id")).mapInPandas(
        _synth_ppm_batches, schema="doc_id bigint, payload binary"
    )
    meta = F.struct(
        F.octet_length("payload").alias("n_bytes"),
        F.lit(MIME_PPM).alias("mime"),
        F.lit("ppm-p6").alias("codec"),
    )
    return rendered.select("doc_id", "payload", meta.alias("meta"))


def _decode_stats_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    from multiomix_aws_emr_spark.operators.codecs import DECODERS

    for pdf in batches:
        ids, ws, hs, sr, sg, sb = [], [], [], [], [], []
        for doc_id, payload, mime in zip(
            pdf["doc_id"], pdf["payload"], pdf["mime"]
        ):
            img = DECODERS[mime](bytes(payload))
            ids.append(doc_id)
            hs.append(img.shape[0])
            ws.append(img.shape[1])
            px = img.astype(np.int64)
            sr.append(int(px[:, :, 0].sum()))
            sg.append(int(px[:, :, 1].sum()))
            sb.append(int(px[:, :, 2].sum()))
        yield pd.DataFrame(
            {
                "doc_id": ids,
                "width": pd.array(ws, dtype="int32"),
                "height": pd.array(hs, dtype="int32"),
                "sum_r": sr,
                "sum_g": sg,
                "sum_b": sb,
            }
        )


def decode_image_stats(media: DataFrame) -> DataFrame:
    """The genuine decode operator: registry-decode each payload and emit
    per-channel pixel sums + dimensions (integers — exact cross-engine).
    Raises KeyError inside the UDF for unregistered mimes: feeding this
    operator undecodable media is a pipeline bug, not a soft fallback.
    Output: (doc_id, width int, height int, sum_r/sum_g/sum_b bigint)."""
    return media.select(
        "doc_id", "payload", F.col("meta.mime").alias("mime")
    ).mapInPandas(
        _decode_stats_batches,
        schema=(
            "doc_id bigint, width int, height int, "
            "sum_r bigint, sum_g bigint, sum_b bigint"
        ),
    )


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
