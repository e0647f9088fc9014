"""Property-based check: the raw-AVI encode/decode pair round-trips over
arbitrary dimensions, frame counts, and pixel bases (wraparound included).

The catalog oracle (video_pixel_stats) covers the wrap-free parameter
family the query synthesizes; hypothesis covers the space — including
base+f+r crossing 256, 1x1 frames, odd frame byte counts (RIFF word
alignment), and single-frame streams. No Spark session needed: the codec
is pure struct + numpy.
"""

from __future__ import annotations

import pytest

try:
    from hypothesis import given, settings
    from hypothesis import strategies as st
except ImportError:  # pragma: no cover
    pytest.skip("hypothesis not installed", allow_module_level=True)

import numpy as np

from random_sampling_based_approximate_mapreduce_spark.sources import multimodal as MM


@settings(max_examples=60, deadline=None)
@given(
    width=st.integers(1, 48),
    height=st.integers(1, 32),
    n_frames=st.integers(1, 12),
    fps=st.integers(1, 60),
    base=st.integers(0, 255),
)
def test_raw_avi_roundtrip(width, height, n_frames, fps, base):
    b = MM.encode_avi_raw(width, height, n_frames, fps, base)
    # header metadata survives
    meta = MM.parse_video_container(b)
    assert (meta["codec"], meta["width"], meta["height"], meta["n_frames"], meta["fps"]) == (
        "DIB ",
        width,
        height,
        n_frames,
        fps,
    )
    # every decoded pixel equals the generator formula, wraparound included
    frames = MM.decode_avi_frames(b)
    assert len(frames) == n_frames
    for f, arr in enumerate(frames):
        assert arr.shape == (height, width, 3)
        expect = np.tile(
            (np.arange(height, dtype=np.int64)[:, None, None] + base + f) % 256,
            (1, width, 3),
        ).astype(np.uint8)
        assert np.array_equal(arr, expect)


@settings(max_examples=30, deadline=None)
@given(
    width=st.integers(1, 32),
    height=st.integers(1, 24),
    n_frames=st.integers(1, 8),
    base=st.integers(0, 255),
    cut=st.integers(1, 64),
)
def test_truncated_raw_avi_never_misdecodes(width, height, n_frames, base, cut):
    """Any truncation either still decodes frames that match the formula
    (cut hit trailing padding) or raises the decoder's own diagnostic —
    never numpy's, and never wrong pixels."""
    b = MM.encode_avi_raw(width, height, n_frames, 10, base)
    cut = min(cut, len(b) - 13)  # keep the RIFF/AVI magic intact
    try:
        frames = MM.decode_avi_frames(b[: len(b) - cut])
    except ValueError as exc:
        assert any(s in str(exc) for s in ("frame chunk", "movi", "header incomplete"))
        return
    for f, arr in enumerate(frames):
        assert np.all(arr[:, 0, 0] == (np.arange(height) + base + f) % 256)


@settings(max_examples=25, deadline=None)
@given(
    samples=st.lists(st.integers(-32768, 32767), min_size=1, max_size=600),
    window=st.sampled_from([4, 16, 256]),
)
def test_audio_features_match_numpy_reference(samples, window):
    """The distributed extractor's per-window math equals a directly-written
    numpy reference on arbitrary PCM16 signals (any length, any window)."""
    import math
    import struct

    data = np.asarray(samples, dtype="<i2").tobytes()
    b = (
        b"RIFF" + struct.pack("<I", 36 + len(data)) + b"WAVE"
        + b"fmt " + struct.pack("<IHHIIHH", 16, 1, 1, 8000, 16000, 2, 16)
        + b"data" + struct.pack("<I", len(data)) + data
    )
    rate, channels, decoded = MM.decode_wav_samples(b)
    assert rate == 8000 and channels == 1
    assert list(decoded) == samples

    # independent pure-Python reference (no numpy vector ops) vs the
    # operator's shared per-window math (window_features is exactly what
    # the distributed extractor applies to each segment)
    for w0 in range(0, len(samples), window):
        seg = samples[w0 : w0 + window]
        rms_ref = math.sqrt(sum(v * v for v in seg) / len(seg))
        zcr_ref = (
            sum(1 for a, b2 in zip(seg, seg[1:]) if a * b2 < 0) / (len(seg) - 1)
            if len(seg) > 1
            else None
        )
        got_rms, got_zcr = MM.window_features(seg)
        assert got_rms == rms_ref
        assert got_zcr == zcr_ref
