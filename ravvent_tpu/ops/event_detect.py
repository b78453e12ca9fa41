"""On-device event detection (JAX): fast5 raw in, event boundaries out.

The TPU-native counterpart of the host event detector
(ravvent_tpu/data/event_detector.py; reference:
event_detection/event_detector.py): phase 1 computes both windows' Welch
t-statistics for every sample with windowed sums (``lax.reduce_window`` —
numerically robust, no global cumsum cancellation, embarrassingly parallel on
the VPU); phase 2 runs the dual-detector peak state machine as a single
``lax.scan`` over time, vectorized across a batch of reads.

Parity domain: exact boundary agreement with the streaming detector for
window configs with ``w2 <= 2*w1`` (covers the production windows 6/9; the
early-sample u32 ring aliasing then reduces to a closed form — see
data/event_detector.py docstring). detect_events_batch() asserts this.

Event statistics (mean/stdv) are cheap per-event host work once boundaries
are known; :func:`boundaries_to_events` computes them in float64 exactly like
the streaming detector.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

FLT_MIN = 1.17549435e-38
FLT_MAX = 3.40282347e38


def _windowed_sums(x: jnp.ndarray, w: int) -> jnp.ndarray:
    """sums[i] = x[i] + ... + x[i+w-1] (valid for i <= S-w; padded tail)."""
    s = jax.lax.reduce_window(
        x, 0.0, jax.lax.add, window_dimensions=(1, w), window_strides=(1, 1),
        padding=((0, 0), (0, w - 1)),
    )
    return s


def compute_tstats_device(raw: jnp.ndarray, w: int, w2: int,
                          n_valid=None) -> jnp.ndarray:
    """Vectorized t-stat for window ``w`` over a batch of reads [B, S].

    ``tstat[:, i]`` equals the streaming detector's value while processing
    sample i (for the parity domain; see module docstring). With
    m = i + 1 - w2 (buf_mid) and S_t[k] = sum of samples[0..k-1]:
      sum1 = S_t[m] - S_t[m-w]   = samples[m-w .. m-1]
      sum2 = S_t[m+w] - S_t[m]   = samples[m   .. m+w-1]

    ``n_valid`` (traced scalar, default = S) is the true per-read length
    when ``raw`` is zero-padded to a static bucket: windows reaching past it
    are dead, exactly as if the array ended there — so the padded program is
    bit-identical to running on the exact-length array.
    """
    B, S = raw.shape
    x = raw.astype(jnp.float32)
    sums = _windowed_sums(x, w)
    sumsq = _windowed_sums(x * x, w)

    i = jnp.arange(S)
    lo1 = i + 1 - w2 - w  # start of window1 (= m - w)
    lo2 = i + 1 - w2  # start of window2 (= m)
    idx1 = jnp.clip(lo1, 0, S - 1)
    idx2 = jnp.clip(lo2, 0, S - 1)

    sum1 = sums[:, idx1]
    sumsq1 = sumsq[:, idx1]
    sum2 = sums[:, idx2]
    sumsq2 = sumsq[:, idx2]

    # Early-sample aliasing (parity domain): when window1 starts before the
    # read (lo1 < 0) but window2 is live, the streaming ring returns
    # sum1 = sumsq1 = 0.
    zero1 = (lo1 < 0)[None, :]
    sum1 = jnp.where(zero1, 0.0, sum1)
    sumsq1 = jnp.where(zero1, 0.0, sumsq1)

    wf = float(w)
    mean1 = sum1 / wf
    mean2 = sum2 / wf
    comb = sumsq1 / wf - mean1 * mean1 + sumsq2 / wf - mean2 * mean2
    comb = jnp.maximum(comb, FLT_MIN)
    tstat = jnp.abs(mean2 - mean1) / jnp.sqrt(comb / wf)

    # quick return: t = i + 2 <= 2w (and window2 must fit in the read).
    # n_valid may be a scalar (all reads share a true length) or a [B]
    # vector (batched segmentation of different-length reads).
    if n_valid is None:
        fit = (lo2 + w <= S)[None, :]
    else:
        nv = jnp.reshape(jnp.asarray(n_valid), (-1, 1))  # [B,1] or [1,1]
        fit = lo2[None, :] + w <= nv
    live = ((i + 2) > 2 * w)[None, :] & (lo2 >= 0)[None, :] & fit
    if w < 2:
        return jnp.zeros_like(tstat)
    return jnp.where(live, tstat, 0.0)


def _peak_step(carry, ts, w1, w2, threshold1, threshold2, peak_height):
    """One sample of the dual-detector peak state machine (any state shape;
    all resets broadcast from scalars). ``ts = (t1, t2, bm, active)``:
    ``active=False`` passes the carry through unchanged and cannot fire —
    used by the blocked scan to dead-step block 0's warm-up region."""
    (s_pos, s_val, s_valid, l_pos, l_val, l_valid, l_masked) = carry
    t1, t2, bm, active = ts

    # --- short detector (skipped when bm == 0: masked_to 0 >= 0) ---
    run_s = (bm != 0) & active
    in_case1 = s_pos == -1
    # case 1
    lower = t1 < s_val
    rise = (t1 - s_val) > peak_height
    s_val_c1 = jnp.where(lower, t1, jnp.where(rise, t1, s_val))
    s_pos_c1 = jnp.where(rise & ~lower, bm, s_pos)
    # case 2
    upd = t1 > s_val
    s_val_c2 = jnp.where(upd, t1, s_val)
    s_pos_c2 = jnp.where(upd, bm, s_pos)
    mask_long = s_val_c2 > threshold1
    s_valid_c2 = s_valid | ((s_val_c2 - t1 > peak_height) & (s_val_c2 > threshold1))
    fire_s = s_valid_c2 & ((bm - s_pos_c2) > (w1 / 2.0))
    s_pos_new = jnp.where(in_case1, s_pos_c1, jnp.where(fire_s, -1, s_pos_c2))
    s_val_new = jnp.where(in_case1, s_val_c1, jnp.where(fire_s, t1, s_val_c2))
    s_valid_new = jnp.where(in_case1, s_valid, jnp.where(fire_s, False, s_valid_c2))
    fire_s = fire_s & ~in_case1 & run_s
    s_pos_new = jnp.where(run_s, s_pos_new, s_pos)
    s_val_new = jnp.where(run_s, s_val_new, s_val)
    s_valid_new = jnp.where(run_s, s_valid_new, s_valid)
    do_mask = run_s & ~in_case1 & mask_long

    # long detector reset by short masking
    l_masked = jnp.where(do_mask, (s_pos_c2 + w1).astype(l_masked.dtype), l_masked)
    l_pos = jnp.where(do_mask, -1, l_pos)
    l_val = jnp.where(do_mask, FLT_MAX, l_val)
    l_valid = jnp.where(do_mask, False, l_valid)

    # --- long detector ---
    run_l = (l_masked < bm) & active
    in_case1l = l_pos == -1
    lowerl = t2 < l_val
    risel = (t2 - l_val) > peak_height
    l_val_c1 = jnp.where(lowerl, t2, jnp.where(risel, t2, l_val))
    l_pos_c1 = jnp.where(risel & ~lowerl, bm, l_pos)
    updl = t2 > l_val
    l_val_c2 = jnp.where(updl, t2, l_val)
    l_pos_c2 = jnp.where(updl, bm, l_pos)
    l_valid_c2 = l_valid | ((l_val_c2 - t2 > peak_height) & (l_val_c2 > threshold2))
    fire_l = l_valid_c2 & ((bm - l_pos_c2) > (w2 / 2.0))
    l_pos_new = jnp.where(in_case1l, l_pos_c1, jnp.where(fire_l, -1, l_pos_c2))
    l_val_new = jnp.where(in_case1l, l_val_c1, jnp.where(fire_l, t2, l_val_c2))
    l_valid_new = jnp.where(in_case1l, l_valid, jnp.where(fire_l, False, l_valid_c2))
    fire_l = fire_l & ~in_case1l & run_l
    l_pos = jnp.where(run_l, l_pos_new, l_pos)
    l_val = jnp.where(run_l, l_val_new, l_val)
    l_valid = jnp.where(run_l, l_valid_new, l_valid)

    fired = fire_s | fire_l
    return (
        (s_pos_new, s_val_new, s_valid_new, l_pos, l_val, l_valid, l_masked),
        fired,
    )


def _peak_init(shape):
    """Default detector state (DEF_PEAK_POS=-1, DEF_PEAK_VAL=FLT_MAX,
    masked_to=0) for any state shape."""
    return (
        jnp.full(shape, -1, jnp.int32), jnp.full(shape, FLT_MAX),
        jnp.zeros(shape, bool),
        jnp.full(shape, -1, jnp.int32), jnp.full(shape, FLT_MAX),
        jnp.zeros(shape, bool),
        jnp.zeros(shape, jnp.int32),
    )


@partial(jax.jit, static_argnames=("w1", "w2"))
def peak_scan_device(
    tstat1: jnp.ndarray,  # [B, S]
    tstat2: jnp.ndarray,
    w1: int,
    w2: int,
    threshold1: float = 1.4,
    threshold2: float = 9.0,
    peak_height: float = 0.2,
) -> jnp.ndarray:
    """Dual-detector peak scan as one lax.scan over time (vectorized over
    reads). Returns a bool [B, S] 'fired' mask: sample i fires => event end
    at stream coordinate ``(i + 1 - w2) - w1 + 1``."""
    B, S = tstat1.shape

    def body(carry, ts):
        return _peak_step(carry, ts, w1, w2, threshold1, threshold2,
                          peak_height)

    i = jnp.arange(S, dtype=jnp.int32)
    bm_seq = i + 1 - w2  # signed; parity domain guarantees no u32 weirdness
    ts = (
        tstat1.T, tstat2.T,
        jnp.broadcast_to(bm_seq[:, None], (S, B)),
        jnp.ones((S, B), bool),
    )
    _, fired = jax.lax.scan(body, _peak_init((B,)), ts)
    return fired.T  # [B, S]


@partial(jax.jit, static_argnames=("w1", "w2", "block", "warmup"))
def peak_scan_device_blocked(
    tstat1: jnp.ndarray,  # [B, S]
    tstat2: jnp.ndarray,
    w1: int,
    w2: int,
    threshold1: float = 1.4,
    threshold2: float = 9.0,
    peak_height: float = 0.2,
    n_valid=None,
    block: int = 512,
    warmup: int = 256,
):
    """Block-parallel speculative execution of the peak state machine, with
    on-device exactness verification. Returns (fired [B, S] bool, ok bool).

    The sequential scan in :func:`peak_scan_device` costs one scan step per
    raw sample (~160k latency-bound steps per read) — the round-3 sigdev
    wire's 58x dispatch slowdown. This variant cuts the sequential length to
    ``warmup + block`` steps by splitting the read into C = ceil(S / block)
    blocks processed in PARALLEL (the detector state vectorizes over blocks
    on the VPU), exploiting the machine's fast forgetting: each fire resets
    the firing detector to (pos=-1, val=t_i, valid=False) — a function of
    the current sample only — and events fire every ~10 samples, so two
    state trajectories over the same samples coalesce almost immediately
    regardless of their starting states.

    Scheme (speculative + verified, NOT approximate):
    - every block first processes the ``warmup`` samples preceding it from
      the DEFAULT detector state (block 0 dead-steps its warm-up and starts
      from the true initial state);
    - the main pass then emits fires for the block's own samples;
    - verification: block c's post-warm-up state must equal block c-1's
      final state — both are states attributed to the same sample index, so
      if they are equal (bitwise, all 7 components) for every block whose
      samples matter (< n_valid), induction from block 0 proves every
      emitted fire bit-identical to the sequential scan.
    Callers fall back to :func:`peak_scan_device` when ``ok`` is False
    (never observed on real pore signal with warmup >= 128; guaranteed to
    be detected when it happens).
    """
    B, S = tstat1.shape
    L, W = block, warmup
    assert W <= L, "warmup must not exceed block"
    C = -(-S // L)
    P = C * L
    pad = P - S

    def prep(t):
        # block c's warm-up samples [cL-W, cL) are the tail W columns of
        # block c-1's main region: a reshape + shifted-concat, no gather
        main = jnp.pad(t, ((0, 0), (0, pad))).reshape(B, C, L)
        warm = jnp.concatenate(
            [jnp.zeros((B, 1, W), t.dtype), main[:, :-1, L - W:]], axis=1)
        return jnp.concatenate([warm, main], axis=2)  # [B, C, W + L]

    t1b = prep(tstat1)
    t2b = prep(tstat2)
    # absolute sample index per (block, step): cL - W + j
    samp = (jnp.arange(C) * L)[:, None] + (jnp.arange(W + L)[None, :] - W)
    bm = (samp + 1 - w2).astype(jnp.int32)
    active = samp >= 0  # block 0's warm-up region is before the read

    def body(carry, ts):
        return _peak_step(carry, ts, w1, w2, threshold1, threshold2,
                          peak_height)

    # scan axes: [W + L, B, C]
    def tx(x):
        return jnp.moveaxis(x, -1, 0)

    ts_warm = (
        tx(t1b[:, :, :W]), tx(t2b[:, :, :W]),
        jnp.broadcast_to(bm[None, :, :W], (B, C, W)).transpose(2, 0, 1),
        jnp.broadcast_to(active[None, :, :W], (B, C, W)).transpose(2, 0, 1),
    )
    warm_end, _ = jax.lax.scan(body, _peak_init((B, C)), ts_warm)

    ts_main = (
        tx(t1b[:, :, W:]), tx(t2b[:, :, W:]),
        jnp.broadcast_to(bm[None, :, W:], (B, C, L)).transpose(2, 0, 1),
        jnp.broadcast_to(active[None, :, W:], (B, C, L)).transpose(2, 0, 1),
    )
    final, fired = jax.lax.scan(body, warm_end, ts_main)
    fired = jnp.moveaxis(fired, 0, -1).reshape(B, P)[:, :S]  # [B, S]

    # --- exactness check: warm_end[c] must equal final[c-1] ---
    # (n_valid scalar or [B]: blocks past a read's true length don't matter)
    if n_valid is None:
        need = (jnp.arange(C) * L < S)[None, :]
    else:
        nv = jnp.reshape(jnp.asarray(n_valid), (-1, 1))
        need = (jnp.arange(C) * L)[None, :] < nv  # [B or 1, C]
    ok = jnp.array(True)
    for we, fi in zip(warm_end, final):
        m = we[:, 1:] == fi[:, :-1]
        ok &= jnp.all(m | ~need[:, 1:])
    return fired, ok


def detect_boundaries_device(
    raw: jnp.ndarray,  # [B, S] (padded reads)
    w1: int = 6,
    w2: int = 9,
    threshold1: float = 1.4,
    threshold2: float = 9.0,
    peak_height: float = 0.2,
    n_valid=None,
    block: int | None = None,
) -> jnp.ndarray:
    """Full on-device pass: returns bool [B, S] mask of event-end firings.

    Event ends in stream coordinates: ``end = i + 2 - w2 - w1`` for fired
    sample i. Only window configs with ``w2 <= 2*w1`` are in the exact-parity
    domain. ``n_valid`` (traced) gives the true read length when ``raw`` is
    zero-padded to a static bucket — firings are then bit-identical to the
    exact-length run (samples >= n_valid never fire).

    ``block`` enables the block-parallel scan (see
    :func:`peak_scan_device_blocked`): ~block/(block+warmup) x fewer
    sequential steps, still bit-exact — the rare coupling failure is
    detected on device and falls back to the sequential scan via
    ``lax.cond`` inside the same program."""
    if w2 > 2 * w1:
        raise ValueError(
            "on-device event detection supports w2 <= 2*w1 (exact-parity "
            "domain); use the host detector for other configs"
        )
    t1 = compute_tstats_device(raw, w1, w2, n_valid)
    t2 = compute_tstats_device(raw, w2, w2, n_valid)
    if block is not None:
        fired_b, ok = peak_scan_device_blocked(
            t1, t2, w1, w2, threshold1, threshold2, peak_height,
            n_valid=n_valid, block=block,
        )
        fired = jax.lax.cond(
            ok,
            lambda: fired_b,
            lambda: peak_scan_device(t1, t2, w1, w2, threshold1, threshold2,
                                     peak_height),
        )
    else:
        fired = peak_scan_device(t1, t2, w1, w2, threshold1, threshold2,
                                 peak_height)
    if n_valid is not None:
        nv = jnp.reshape(jnp.asarray(n_valid), (-1, 1))
        fired = fired & (jnp.arange(raw.shape[1])[None, :] < nv)
    return fired


def fired_to_event_lens(fired: jnp.ndarray, w1: int, w2: int, max_events: int):
    """Fired mask [S] -> (lens [max_events] i32, n_events i32, uncapped count).

    Mirrors :func:`boundaries_to_events`' boundary semantics (strictly
    increasing ends; ends <= 0 skipped) without materializing events on
    host: ends scatter into a fixed-size array; lengths are the diffs.
    ``n_events`` saturates at ``max_events`` — callers must check the
    uncapped count to detect overflow."""
    S = fired.shape[0]
    i = jnp.arange(S, dtype=jnp.int32)
    ends = i + 2 - w2 - w1
    keep = fired & (ends > 0)
    n_true = jnp.sum(keep.astype(jnp.int32))
    pos = jnp.cumsum(keep.astype(jnp.int32)) - 1
    idx = jnp.where(keep, pos, max_events)
    ends_arr = jnp.zeros(max_events, jnp.int32).at[idx].set(ends, mode="drop")
    prev = jnp.concatenate([jnp.zeros(1, jnp.int32), ends_arr[:-1]])
    n_ev = jnp.minimum(n_true, max_events)
    rows = jnp.arange(max_events, dtype=jnp.int32)
    lens = jnp.where(rows < n_ev, ends_arr - prev, 0)
    return lens, n_ev, n_true


def boundaries_to_events(
    raw: np.ndarray, fired: np.ndarray, w1: int = 6, w2: int = 9
) -> np.ndarray:
    """Host-side event assembly from a fired mask (float64, exactly the
    streaming detector's statistics). Returns [n_events, 4]
    (start, length, mean, stdv)."""
    import math

    idx = np.nonzero(fired)[0]
    ends = idx + 2 - w2 - w1  # stream coordinates
    S = np.concatenate(([0.0], np.cumsum(np.asarray(raw, np.float64))))
    Sq = np.concatenate(([0.0], np.cumsum(np.asarray(raw, np.float64) ** 2)))
    events = []
    st, st_sum, st_sq = 0, 0.0, 0.0
    for en in ends:
        if en <= st:
            continue
        length = float(en - st)
        e_sum, e_sq = S[en], Sq[en]
        mean = (e_sum - st_sum) / length
        deltasqr = e_sq - st_sq
        stdv = math.sqrt(max(deltasqr / length - mean**2, FLT_MIN))
        events.append((st, int(length), mean, stdv))
        st, st_sum, st_sq = en, e_sum, e_sq
    return np.array(events).reshape(-1, 4)
