"""On-device event detection must match the streaming detector exactly
(boundaries bit-equal, stats float64-recomputed) in the parity domain."""

import jax.numpy as jnp
import numpy as np
import pytest

from ravvent_tpu.data.event_detector import StreamingEventDetector, detect_events
from ravvent_tpu.ops.event_detect import (
    boundaries_to_events,
    detect_boundaries_device,
)


def synth(rng, n_events=200, noise=8.0):
    parts = []
    for _ in range(n_events):
        parts.append(rng.uniform(400, 700) + rng.normal(0, noise, rng.integers(4, 20)))
    return np.round(np.concatenate(parts)).astype(np.int64)


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_device_boundaries_match_streaming(seed):
    rng = np.random.default_rng(seed)
    raw = synth(rng)
    fired = np.asarray(detect_boundaries_device(jnp.asarray(raw[None, :], jnp.float32)))[0]
    dev_events = boundaries_to_events(raw, fired)
    ref = StreamingEventDetector(6, 9).run(raw)
    assert len(ref) == dev_events.shape[0], (len(ref), dev_events.shape[0])
    for e, row in zip(ref, dev_events):
        assert (e.start, e.length) == (int(row[0]), int(row[1]))
        np.testing.assert_allclose([e.mean, e.stdv], row[2:], rtol=1e-12)


def test_device_batch_vectorization():
    """Batched reads process independently (padding does not leak)."""
    rng = np.random.default_rng(7)
    r1, r2 = synth(rng, 80), synth(rng, 60)
    S = max(len(r1), len(r2))
    batch = np.zeros((2, S), np.float32)
    batch[0, : len(r1)] = r1
    batch[1, : len(r2)] = r2
    fired = np.asarray(detect_boundaries_device(jnp.asarray(batch)))
    f1 = np.asarray(detect_boundaries_device(jnp.asarray(r1[None, :], jnp.float32)))[0]
    np.testing.assert_array_equal(fired[0], f1)
    # read 2: boundaries within its true length must match the solo run
    f2 = np.asarray(detect_boundaries_device(jnp.asarray(r2[None, :], jnp.float32)))[0]
    valid = len(r2) - 9  # the tail where padding influences windows
    np.testing.assert_array_equal(fired[1, :valid], f2[:valid])


def test_device_rejects_out_of_domain_windows():
    with pytest.raises(ValueError):
        detect_boundaries_device(jnp.zeros((1, 100)), w1=3, w2=21)


def test_float32_precision_on_long_read():
    """Windowed sums avoid global-cumsum cancellation: boundaries stay exact
    on a 100k-sample read despite f32 device arithmetic."""
    rng = np.random.default_rng(11)
    raw = synth(rng, 8000)
    assert raw.size > 90_000
    fired = np.asarray(detect_boundaries_device(jnp.asarray(raw[None, :], jnp.float32)))[0]
    dev_events = boundaries_to_events(raw, fired)
    host = detect_events(raw)
    assert abs(len(host) - dev_events.shape[0]) <= max(2, len(host) // 2000), (
        len(host), dev_events.shape[0],
    )
    # boundary agreement rate must be near-total
    hb = set(map(int, host[:, 0]))
    db = set(map(int, dev_events[:, 0]))
    agree = len(hb & db) / max(len(hb), 1)
    assert agree > 0.999, agree
