"""Audio modality: genuine WAV (PCM 16-bit) codec via the stdlib
``wave`` module + Arrow-batched feature extraction.

The second real media tier beside images (operators/codecs.py): WAV
PCM is decodable with the Python standard library alone, so — unlike
JPEG/MP3, whose codecs are not baked into this container — the decode
here is the real operation end to end: RIFF header parse, sample-width/
channel validation, int16 PCM frames out.

Scale shape mirrors the image tier: payloads ride an opaque ``binary``
column, decode/feature passes are ``mapInPandas`` (one Arrow batch in,
one out, no shuffle), and synthesized fixtures use CLOSED-FORM sample
values so a SQL oracle can recompute the extracted features exactly.
"""

from __future__ import annotations

import io
import wave
from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MIME_WAV = "audio/wav"

_SAMPLE_RATE = 8_000
_N_SAMPLES = 256


def wav_encode(samples: np.ndarray, *, sample_rate: int = _SAMPLE_RATE) -> bytes:
    """Encode a 1-D int16 array as mono PCM WAV bytes (stdlib ``wave``)."""
    samples = np.ascontiguousarray(samples, dtype=np.int16)
    if samples.ndim != 1:
        raise ValueError(f"expected 1-D samples, got shape {samples.shape}")
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sample_rate)
        w.writeframes(samples.tobytes())
    return buf.getvalue()


def wav_decode(payload: bytes) -> np.ndarray:
    """Decode mono PCM-16 WAV bytes to a 1-D int16 array."""
    with wave.open(io.BytesIO(bytes(payload)), "rb") as w:
        if w.getnchannels() != 1 or w.getsampwidth() != 2:
            raise ValueError(
                "only mono 16-bit PCM supported "
                f"(got {w.getnchannels()} ch, width {w.getsampwidth()})"
            )
        frames = w.readframes(w.getnframes())
    return np.frombuffer(frames, dtype=np.int16).copy()


def _synth_wav_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    idx = np.arange(_N_SAMPLES, dtype=np.int64)
    for pdf in batches:
        ids, payloads = [], []
        for doc_id in pdf["doc_id"]:
            # sample i of doc d = ((d*17 + i*7) % 2048) - 1024: closed
            # form, so decoded statistics stay SQL-recomputable
            samples = (((int(doc_id) * 17 + idx * 7) % 2048) - 1024).astype(
                np.int16
            )
            ids.append(doc_id)
            payloads.append(wav_encode(samples))
        yield pd.DataFrame({"doc_id": ids, "payload": payloads})


def synthesize_wav_media(df: DataFrame, *, id_col: str) -> DataFrame:
    """Render a deterministic 256-sample mono WAV per row — a REAL RIFF/
    PCM payload ``wav_decode`` parses for real, with closed-form sample
    values. Output: (doc_id, payload binary, meta struct)."""
    rendered = df.select(F.col(id_col).alias("doc_id")).mapInPandas(
        _synth_wav_batches, schema="doc_id bigint, payload binary"
    )
    meta = F.struct(
        F.octet_length("payload").alias("n_bytes"),
        F.lit(MIME_WAV).alias("mime"),
        F.lit("pcm16-mono").alias("codec"),
    )
    return rendered.select("doc_id", "payload", meta.alias("meta"))


def _audio_stats_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        ids, ns, sa, mx, zc = [], [], [], [], []
        for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
            samples = wav_decode(payload).astype(np.int64)
            ids.append(doc_id)
            ns.append(len(samples))
            sa.append(int(np.abs(samples).sum()))
            mx.append(int(samples.max()))
            # sign flips between consecutive samples (0 counts as +)
            sign = samples >= 0
            zc.append(int((sign[1:] != sign[:-1]).sum()))
        yield pd.DataFrame(
            {
                "doc_id": ids,
                "n_samples": pd.array(ns, dtype="int32"),
                "sum_abs": sa,
                "max_amp": mx,
                "zero_crossings": pd.array(zc, dtype="int32"),
            }
        )


def audio_decode_stats(media: DataFrame) -> DataFrame:
    """Genuine audio decode + integer features (exact cross-engine):
    sample count, sum of |amplitude|, max amplitude, and zero-crossing
    count. Output: (doc_id, n_samples int, sum_abs bigint, max_amp
    bigint, zero_crossings int)."""
    return media.select("doc_id", "payload").mapInPandas(
        _audio_stats_batches,
        schema=(
            "doc_id bigint, n_samples int, sum_abs bigint, "
            "max_amp bigint, zero_crossings int"
        ),
    )
