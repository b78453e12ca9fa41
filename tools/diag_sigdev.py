"""Diagnose the sigdev (signal-only) wire against the host compact path.

Runs one read's front half (segmentation -> features -> snippet ranges)
through the device functions (on CPU) and compares against the host compact
representation, then decodes a small slab through both input sets with the
trained flagship checkpoint and compares token streams.

Usage: JAX_PLATFORMS=cpu python tools/diag_sigdev.py [read.signal]
"""
import os, sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from ravvent_tpu.data import chiron
from ravvent_tpu.data.snippets import load_read_compact_ex
from ravvent_tpu.evaluation.basecall import (
    _device_event_features_selfscaled, _device_snippet_count,
    _device_snippet_ranges,
)
from ravvent_tpu.ops.event_detect import (
    detect_boundaries_device, fired_to_event_lens,
)

path = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/.bench_data/read_0000.signal"
label = path.replace(".signal", ".label")
stride = 6

raw = chiron.load_signal(path)
print(f"read: {path}  samples={raw.size}")

# ---- host compact path ----
sig_h, rr_h, ev_h, er_h, nuc_h, aux = load_read_compact_ex(path, label, stride)
print(f"host: n_events={len(aux['ev_lens'])} n_snippets={rr_h.shape[0]}")
print(f"host rr[0]={rr_h[0]} rr[-1]={rr_h[-1]} er[0]={er_h[0]} er[-1]={er_h[-1]}")
print(f"host events_sc stats: mean={ev_h.mean(0)} std={ev_h.std(0)}")

# ---- device sigdev front half (mirrors _segment in BasecallEngine) ----
n_s = raw.size
S_b = max(65536, ((n_s + 65535) // 65536) * 65536)
E_b = S_b // 2
N_max = E_b // stride + 1 + 4096
rmean = float(raw.astype(np.float64).mean())
rstd = float(raw.astype(np.float64).std()) or 1.0
raw_pad = np.zeros(S_b, np.float32)
raw_pad[:n_s] = raw.astype(np.float32)

fired = detect_boundaries_device(jnp.asarray(raw_pad)[None, :], n_valid=jnp.int32(n_s))[0]
lens, n_ev, n_true = fired_to_event_lens(fired, 6, 9, E_b)
n_ev_i = int(n_ev)
print(f"dev: n_events={n_ev_i} (true {int(n_true)})")
sig_d = (raw_pad - rmean) / rstd
sig_d = np.where(np.arange(S_b) < n_s, sig_d, 0.0)
feats = np.asarray(_device_event_features_selfscaled(
    jnp.asarray(sig_d, jnp.float32), lens, n_ev, rm=rmean, rs=rstd))
n_snip = int(_device_snippet_count(lens, n_ev, N_max, stride))
rr_d, er_d = (np.asarray(a) for a in _device_snippet_ranges(
    lens, jnp.int32(n_snip), n_ev, N_max, stride))
rr_d, er_d = rr_d[:n_snip], er_d[:n_snip]
print(f"dev: n_snippets={n_snip}")
print(f"dev rr[0]={rr_d[0]} rr[-1]={rr_d[-1]} er[0]={er_d[0]} er[-1]={er_d[-1]}")
print(f"dev feats[:n_ev] stats: mean={feats[:n_ev_i].mean(0)} std={feats[:n_ev_i].std(0)}")

# ---- compare event lengths (host events are label-clipped; find offset) ----
lens_d = np.asarray(lens)[:n_ev_i]
lens_h = aux["ev_lens"]
# host event 0 is boundary-patched; align by host event 1's start
starts_d = np.cumsum(lens_d) - lens_d
starts_h = np.asarray(aux["ev_starts"])
common = np.intersect1d(starts_d, starts_h[1:-1])
print(f"boundary agreement: {len(common)}/{len(starts_h)-2} interior host starts found on device")

# ---- feature comparison on matched interior events ----
idx_d = {int(s): i for i, s in enumerate(starts_d)}
pairs = [(idx_d[int(s)], j + 1) for j, s in enumerate(starts_h[1:-1]) if int(s) in idx_d]
if pairs:
    di, hi = map(np.array, zip(*pairs))
    diff = feats[di] - ev_h[hi]
    for c, name in enumerate(["len", "mean", "stdv", "mean^2", "dmean"]):
        print(f"  feat[{name}]: host~dev corr="
              f"{np.corrcoef(ev_h[hi][:, c], feats[di][:, c])[0,1]:.4f} "
              f"max|diff|={np.abs(diff[:, c]).max():.3f} rms={np.sqrt((diff[:, c]**2).mean()):.3f}")

# ---- decode a small slab through both, trained flagship ----
sys.path.insert(0, "/root/repo")
from bench import load_flagship
cfg, params, trained = load_flagship()
print(f"flagship trained={trained}")
from ravvent_tpu.evaluation.basecall import BasecallEngine
eng = BasecallEngine(params, cfg, chunk_size=64, beam_impl="xla",
                     transport_dtype="f32")

n_test = 48
max_len = int((nuc_h != 0).sum(axis=1).max())
tok_h, prob_h = eng.predict_beam_compact(
    sig_h, rr_h[:n_test], ev_h, er_h[:n_test], max_len, 5)

# device-input decode: same engine but feed sigdev-derived arrays
S_real = int(min(rr_d[:n_test, 1].max() + 64, S_b))
tok_d, prob_d = eng.predict_beam_compact(
    np.ascontiguousarray(sig_d[:S_real], np.float32), rr_d[:n_test],
    np.ascontiguousarray(feats[:n_ev_i]), er_d[:n_test], max_len, 5)

from ravvent_tpu.tokenizer import NUC_TOKENIZER
seq_h = NUC_TOKENIZER.sequences_to_texts(tok_h)
seq_d = NUC_TOKENIZER.sequences_to_texts(tok_d)
same = sum(a == b for a, b in zip(seq_h, seq_d))
print(f"decoded snippet parity: {same}/{n_test} identical")
for i in range(min(6, n_test)):
    print(f"  [{i}] host={seq_h[i][:40]!r}")
    print(f"      dev ={seq_d[i][:40]!r}")
