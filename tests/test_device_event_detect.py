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


# ---------------------------------------------------------------------------
# Signal-only wire ("sigdev"): full on-device segmentation pipeline
# ---------------------------------------------------------------------------

def test_fired_to_event_lens_matches_boundaries_to_events():
    from ravvent_tpu.ops.event_detect import fired_to_event_lens

    rng = np.random.default_rng(5)
    raw = synth(rng, 150)
    fired = np.asarray(
        detect_boundaries_device(jnp.asarray(raw[None, :], jnp.float32)))[0]
    ref = boundaries_to_events(raw, fired)
    lens, n_ev, n_true = jnp.asarray(fired_to_event_lens(
        jnp.asarray(fired), 6, 9, 4096)[0]), *[
        int(x) for x in fired_to_event_lens(jnp.asarray(fired), 6, 9, 4096)[1:]]
    assert n_true == n_ev == ref.shape[0]
    np.testing.assert_array_equal(np.asarray(lens)[:n_ev], ref[:, 1].astype(int))
    # starts are the cumsum of lens (events tile from 0)
    starts = np.concatenate(([0], np.cumsum(np.asarray(lens)[:n_ev])[:-1]))
    np.testing.assert_array_equal(starts, ref[:, 0].astype(int))


def test_padded_detection_bit_identical_to_exact_length():
    """Zero-padding to a static bucket with n_valid must not change any
    firing (the sigdev wire pads reads to 64k buckets)."""
    rng = np.random.default_rng(9)
    raw = synth(rng, 120)
    S = len(raw)
    exact = np.asarray(
        detect_boundaries_device(jnp.asarray(raw[None, :], jnp.float32)))[0]
    padded = np.zeros(S + 977, np.float32)
    padded[:S] = raw
    p = np.asarray(detect_boundaries_device(
        jnp.asarray(padded[None, :]), n_valid=S))[0]
    np.testing.assert_array_equal(p[:S], exact)
    assert not p[S:].any()


def test_sigdev_segmentation_matches_host_pipeline():
    """The engine's device segmentation program must reproduce the host
    pipeline label-free: streaming-detector boundaries (bit-exact), the
    host sliding-window snippet rule on those events, and self-scaled
    features (close to host StandardScaler output)."""
    import jax

    from ravvent_tpu.config import ModelConfig
    from ravvent_tpu.data.event_detector import StreamingEventDetector
    from ravvent_tpu.data.snippets import (
        compute_fitting_event_ranges, standardize_fit,
    )
    from ravvent_tpu.evaluation.basecall import BasecallEngine
    from ravvent_tpu.models.basecaller import init_basecaller

    rng = np.random.default_rng(13)
    raw = synth(rng, 400)

    mcfg = ModelConfig(enc_units=8, dec_units=8, encoder_depth=1,
                      decoder_depth=1, rnn_type="bilstm", data_type="joint")
    params = init_basecaller(jax.random.PRNGKey(0), mcfg)
    eng = BasecallEngine(params, mcfg, chunk_size=512)

    # run just the segmentation program the way dispatch_beam_signal does
    n_s = raw.size
    rmean = float(raw.astype(np.float64).mean())
    rstd = float(raw.astype(np.float64).std())
    S_b = eng._bucket(n_s, 65536)
    E_b = S_b // 2
    N_max = E_b // 6 + 1 + eng.chunk_size
    hdr = np.zeros(8, np.float32)
    hdr[0], hdr[1] = rmean, rstd
    hdr[2:3].view(np.int32)[0] = n_s
    buf = np.zeros(32 + S_b * 2, np.uint8)
    buf[:32] = hdr.view(np.uint8)
    buf[32:32 + n_s * 2] = raw.astype(np.int16).view(np.uint8).reshape(-1)
    sig, feats, rr, er, meta = eng._segment_jit(
        jnp.asarray(buf), S_b=S_b, E_b=E_b, N_max=N_max, stride=6)
    n_ev, n_snip = (int(v) for v in np.asarray(meta))

    # host label-free reference
    host_events = StreamingEventDetector(6, 9).run(raw)
    assert n_ev == len(host_events)
    host_lens = np.array([e.length for e in host_events], np.int64)
    host_er = compute_fitting_event_ranges(host_lens, 6)
    assert n_snip == host_er.shape[0]
    np.testing.assert_array_equal(np.asarray(er)[:n_snip], host_er)
    # raw ranges: [start of first event, start of last event)
    host_starts = np.concatenate(([0], np.cumsum(host_lens)))[:-1]
    host_rr = np.column_stack(
        (host_starts[host_er[:, 0]], host_starts[host_er[:, 1] - 1]))
    np.testing.assert_array_equal(np.asarray(rr)[:n_snip], host_rr)

    # features: host standardization of (len, mean, stdv, mean^2, dmean)
    # computed in RAW units (what the training pipeline's StandardScaler
    # sees — mean^2 is not affine-invariant, so unit choice matters;
    # reference: data_loader.py:74-79)
    rf = raw.astype(np.float64)
    means = np.array([rf[e.start:e.start + e.length].mean() for e in host_events])
    stds = np.array([rf[e.start:e.start + e.length].std() for e in host_events])
    dmean = np.concatenate(([0.0], np.diff(means)))
    F = np.column_stack((host_lens.astype(float), means, stds, means**2, dmean))
    fm, fs = standardize_fit(F)
    host_feats = (F - fm) / fs
    np.testing.assert_allclose(
        np.asarray(feats)[:n_ev], host_feats, rtol=2e-2, atol=2e-2)


@pytest.mark.parametrize("seed,n_events", [(0, 200), (3, 2000), (11, 8000)])
def test_blocked_peak_scan_bit_identical(seed, n_events):
    """The block-parallel speculative scan must reproduce the sequential
    scan bit-for-bit (coupling verified on device, ok=True)."""
    from ravvent_tpu.ops.event_detect import (
        compute_tstats_device, peak_scan_device_blocked,
    )

    rng = np.random.default_rng(seed)
    raw = synth(rng, n_events)
    t = jnp.asarray(raw[None, :], jnp.float32)
    seq = np.asarray(detect_boundaries_device(t))
    blk = np.asarray(detect_boundaries_device(t, block=512))
    np.testing.assert_array_equal(seq, blk)
    t1 = compute_tstats_device(t, 6, 9)
    t2 = compute_tstats_device(t, 9, 9)
    _, ok = peak_scan_device_blocked(t1, t2, 6, 9)
    assert bool(ok)


def test_blocked_peak_scan_padded_matches_exact():
    rng = np.random.default_rng(9)
    raw = synth(rng, 1200)
    S = len(raw)
    pad = np.zeros(S + 7777, np.float32)
    pad[:S] = raw
    a = np.asarray(detect_boundaries_device(
        jnp.asarray(pad[None, :]), n_valid=S, block=512))[0]
    b = np.asarray(detect_boundaries_device(
        jnp.asarray(raw[None, :], jnp.float32)))[0]
    np.testing.assert_array_equal(a[:S], b)
    assert not a[S:].any()


def test_blocked_peak_scan_detects_coupling_failure():
    """A pathological t-stat trace whose detector state remembers further
    back than the warm-up window must FAIL verification (ok=False) — and
    detect_boundaries_device's lax.cond fallback must still return the
    sequential answer."""
    from ravvent_tpu.ops.event_detect import (
        peak_scan_device, peak_scan_device_blocked,
    )

    S = 4096
    t = np.full(S, 1.0, np.float32)
    t[:50] = 5.0
    t[60] = 0.1  # ancient dip: sequential state carries pos/val from here
    t1 = jnp.asarray(t[None, :])
    fb, ok = peak_scan_device_blocked(t1, t1, 6, 9, block=512, warmup=256)
    assert not bool(ok)
    # the end-to-end path must still be exact via the fallback branch
    seq = np.asarray(peak_scan_device(t1, t1, 6, 9))
    # emulate detect_boundaries_device's cond at this level
    got = np.asarray(fb) if bool(ok) else seq
    np.testing.assert_array_equal(got, seq)


def test_sigdev_end_to_end_decode_runs():
    """predict_beam_signal: raw ints in, (tokens, probs) out, row count =
    the host snippet count."""
    import jax

    from ravvent_tpu.config import ModelConfig
    from ravvent_tpu.evaluation.basecall import BasecallEngine
    from ravvent_tpu.models.basecaller import init_basecaller

    rng = np.random.default_rng(21)
    raw = synth(rng, 300)
    mcfg = ModelConfig(enc_units=8, dec_units=8, encoder_depth=1,
                      decoder_depth=1, rnn_type="bilstm", data_type="joint")
    params = init_basecaller(jax.random.PRNGKey(0), mcfg)
    eng = BasecallEngine(params, mcfg, chunk_size=512)
    out = eng.predict_beam_signal(raw, max_output_len=32, beam_width=2)
    assert out is not None
    tokens, probs = out
    assert tokens.shape[0] > 10
    assert tokens.shape == probs.shape

    # return_ranges: same decode plus the device snippet raw ranges — one
    # [start, end) sample span per token row, monotonically advancing
    # (feeds the merge fold's positional prior on the label-free wire)
    out2 = eng.predict_beam_signal(raw, max_output_len=32, beam_width=2,
                                   return_ranges=True)
    t2, p2, rr = out2
    np.testing.assert_array_equal(t2, tokens)
    assert rr is not None and rr.shape == (tokens.shape[0], 2)
    assert np.all(rr[:, 1] > rr[:, 0])
    assert np.all(np.diff(rr[:, 0]) > 0)
    assert rr[:, 1].max() <= raw.size


def test_sigdev_batched_segmentation_parity():
    """begin_beam_signal_batch (K reads, ONE upload + ONE segmentation
    dispatch, padded to the batch-max bucket) must decode bit-identically
    to the per-read path — including different-length reads, whose per-read
    n_valid flows through the t-stats / blocked peak scan / exactness
    check (the round-5 vector-n_valid plumbing)."""
    import jax

    from ravvent_tpu.config import ModelConfig
    from ravvent_tpu.evaluation.basecall import BasecallEngine
    from ravvent_tpu.models.basecaller import init_basecaller

    rng = np.random.default_rng(5)
    mcfg = ModelConfig(enc_units=8, dec_units=8, encoder_depth=1,
                      decoder_depth=1, rnn_type="bilstm", data_type="joint")
    params = init_basecaller(jax.random.PRNGKey(0), mcfg)
    eng = BasecallEngine(params, mcfg, chunk_size=512)
    raws = [synth(rng, n // 9) for n in (3000, 5200, 1400)]

    singles = []
    for r in raws:
        h = eng.finish_beam_signal(eng.begin_beam_signal(r),
                                   max_output_len=32, beam_width=2)
        singles.append(eng.collect_beam_compact(h))
    segs = eng.begin_beam_signal_batch(raws)
    for (t1, p1), seg in zip(singles, segs):
        h = eng.finish_beam_signal(seg, max_output_len=32, beam_width=2)
        t2, p2 = eng.collect_beam_compact(h)
        np.testing.assert_array_equal(t1, t2)
        np.testing.assert_array_equal(p1, p2)
