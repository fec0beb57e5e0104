"""Property-based round-trips for the pure-python media codecs and the
deterministic sampling primitives (hypothesis)."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from pyp_etl_pipeline_spark.multimodal import codecs


@settings(max_examples=50, deadline=None)
@given(
    width=st.integers(min_value=1, max_value=40),
    height=st.integers(min_value=1, max_value=40),
    value=st.integers(min_value=0, max_value=255),
)
def test_png_gray_roundtrip_property(width, height, value):
    d = codecs.png_decode(codecs.png_encode_gray(width, height, value))
    assert (d["width"], d["height"]) == (width, height)
    assert d["mean_val"] == float(value)
    assert d["color_type"] == 0 and d["bit_depth"] == 8


@settings(max_examples=50, deadline=None)
@given(
    samples=st.lists(st.integers(min_value=-32768, max_value=32767), min_size=1, max_size=500),
    rate=st.sampled_from([8000, 16000, 44100]),
)
def test_wav_pcm16_roundtrip_property(samples, rate):
    d = codecs.wav_decode(codecs.wav_encode_pcm16(samples, rate))
    assert d["n_samples"] == len(samples)
    assert d["sample_rate"] == rate
    assert d["duration_ms"] == 1000.0 * len(samples) / rate
    expected_rms = float(np.sqrt(np.mean(np.asarray(samples, dtype=np.float64) ** 2)))
    assert abs(d["rms"] - expected_rms) < 1e-9


@settings(max_examples=30, deadline=None)
@given(payload=st.binary(min_size=0, max_size=64))
def test_sniff_never_lies_on_garbage(payload):
    kind = codecs.sniff_kind(payload)
    if kind == "png":
        assert payload.startswith(codecs.PNG_MAGIC)
    elif kind == "wav":
        assert payload[:4] == b"RIFF" and payload[8:12] == b"WAVE"
