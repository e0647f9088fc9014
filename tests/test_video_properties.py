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
