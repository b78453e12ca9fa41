"""Parity tests: vectorized event detection vs. the streaming spec.

The streaming detector is the executable spec (faithful port of
reference event_detection/event_detector.py); the vectorized detector must be
bit-identical on realistic and adversarial signals.
"""

import numpy as np
import pytest

from ravvent_tpu.data.event_detector import (
    StreamingEventDetector,
    detect_events,
    compute_tstats,
)


def synth_signal(rng, n_events=40, mean_lo=400, mean_hi=700, dwell_lo=4, dwell_hi=20, noise=8.0):
    """Step-wise signal mimicking nanopore current (int samples like chiron)."""
    parts = []
    for _ in range(n_events):
        level = rng.uniform(mean_lo, mean_hi)
        dwell = rng.integers(dwell_lo, dwell_hi)
        parts.append(level + rng.normal(0, noise, dwell))
    return np.round(np.concatenate(parts)).astype(np.int64)


@pytest.mark.parametrize("seed", [0, 1, 2])
@pytest.mark.parametrize("use_native", [False, True])
def test_vectorized_matches_streaming_default_windows(seed, use_native):
    rng = np.random.default_rng(seed)
    raw = synth_signal(rng, n_events=120)
    ref = StreamingEventDetector(6, 9).run(raw)
    fast = detect_events(raw, 6, 9, use_native=use_native)
    assert len(ref) == fast.shape[0], (len(ref), fast.shape[0])
    for e, row in zip(ref, fast):
        assert e.start == int(row[0])
        assert e.length == int(row[1])
        assert e.mean == row[2]
        assert e.stdv == row[3]


@pytest.mark.parametrize("use_native", [False, True])
def test_long_signal_parity(use_native):
    """On long signals, event boundaries must be exactly the streaming
    detector's; means/stdvs may differ by ULP-amplification (np.cumsum
    pairwise summation / compiler codegen) — bounded at 1e-9 relative."""
    rng = np.random.default_rng(123)
    raw = synth_signal(rng, n_events=2500)
    ref = StreamingEventDetector(6, 9).run(raw)
    fast = detect_events(raw, 6, 9, use_native=use_native)
    assert len(ref) == fast.shape[0]
    ref_arr = np.array([(e.start, e.length, e.mean, e.stdv) for e in ref])
    np.testing.assert_array_equal(ref_arr[:, :2], fast[:, :2])
    np.testing.assert_allclose(ref_arr[:, 2:], fast[:, 2:], rtol=1e-9)


@pytest.mark.parametrize("w1,w2", [(3, 6), (5, 9), (6, 9), (5, 13), (4, 8), (9, 10)])
def test_vectorized_matches_streaming_window_sweep(w1, w2):
    rng = np.random.default_rng(1234)
    raw = synth_signal(rng, n_events=60)
    ref = StreamingEventDetector(w1, w2).run(raw)
    fast = detect_events(raw, w1, w2)
    assert len(ref) == fast.shape[0]
    for e, row in zip(ref, fast):
        assert (e.start, e.length) == (int(row[0]), int(row[1]))
        assert e.mean == row[2] and e.stdv == row[3]


def test_constant_signal_no_events():
    raw = np.full(500, 450)
    assert len(StreamingEventDetector().run(raw)) == detect_events(raw).shape[0]


def test_tstat_matches_streaming_values():
    """Spot-check the vectorized t-stat against values the streaming detector
    computes internally."""
    rng = np.random.default_rng(7)
    raw = synth_signal(rng, n_events=20)

    det = StreamingEventDetector(6, 9)
    stream_t1, stream_t2 = [], []
    orig = det._compute_tstat

    def wrapped(w):
        v = orig(w)
        (stream_t1 if w == det.w1 else stream_t2).append(v)
        return v

    det._compute_tstat = wrapped
    det.run(raw)

    t1 = compute_tstats(raw, 6, 9)
    t2 = compute_tstats(raw, 9, 9)
    np.testing.assert_array_equal(t1, np.array(stream_t1))
    np.testing.assert_array_equal(t2, np.array(stream_t2))


def test_event_coordinates_are_stream_offset():
    """Events use stream coordinates (= sample index + 1) and tile the read
    contiguously from 0."""
    rng = np.random.default_rng(3)
    raw = synth_signal(rng, n_events=50)
    ev = detect_events(raw)
    assert ev.shape[0] > 5
    starts, lengths = ev[:, 0].astype(int), ev[:, 1].astype(int)
    assert starts[0] == 0
    np.testing.assert_array_equal(starts[1:], starts[:-1] + lengths[:-1])
    assert starts[-1] + lengths[-1] <= raw.size + 1
