"""WAV codec round-trip + the audio decode operator (second genuine
media modality beside PPM/BMP images — stdlib ``wave``, real RIFF
parse)."""

from __future__ import annotations

import numpy as np
import pytest

from multiomix_aws_emr_spark.operators.audio import (
    audio_decode_stats,
    synthesize_wav_media,
    wav_decode,
    wav_encode,
)


def test_wav_roundtrip():
    rng = np.random.RandomState(11)
    samples = rng.randint(-32768, 32767, 500).astype(np.int16)
    assert np.array_equal(wav_decode(wav_encode(samples)), samples)


def test_wav_decode_rejects_unsupported():
    import io
    import wave as _wave

    buf = io.BytesIO()
    with _wave.open(buf, "wb") as w:
        w.setnchannels(2)  # stereo unsupported
        w.setsampwidth(2)
        w.setframerate(8000)
        w.writeframes(b"\x00\x00\x00\x00")
    with pytest.raises(ValueError):
        wav_decode(buf.getvalue())
    with pytest.raises(Exception):
        wav_decode(b"not a riff header")


def test_audio_stats_match_closed_form(spark, sf_dir):
    """Decoded features must equal the closed-form sample definition
    sample(d, i) = ((d*17 + i*7) % 2048) - 1024."""
    from multiomix_aws_emr_spark.sources.tables import load

    docs = load(spark, sf_dir, "documents").limit(8)
    media = synthesize_wav_media(docs, id_col="doc_id")
    got = {r["doc_id"]: r for r in audio_decode_stats(media).collect()}
    assert got
    i = np.arange(256, dtype=np.int64)
    for d, r in got.items():
        s = ((d * 17 + i * 7) % 2048) - 1024
        assert r["n_samples"] == 256
        assert r["sum_abs"] == int(np.abs(s).sum())
        assert r["max_amp"] == int(s.max())
        sign = s >= 0
        assert r["zero_crossings"] == int((sign[1:] != sign[:-1]).sum())
