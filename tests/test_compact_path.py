"""The compact (on-device gather) inference path must match the materialized
snippet path exactly."""

import jax
import jax.numpy as jnp
import numpy as np

from ravvent_tpu.config import ModelConfig
from ravvent_tpu.data import chiron, simulator
from ravvent_tpu.data.snippets import load_read_compact, load_read_snippets
from ravvent_tpu.evaluation.basecall import BasecallEngine
from ravvent_tpu.models.basecaller import init_basecaller


def test_compact_matches_materialized(tmp_path):
    rng = np.random.default_rng(0)
    genome = simulator.random_genome(2500, rng)
    sig, ranges = simulator.simulate_read(genome, rng, simulator.PoreModel())
    sp, lp = tmp_path / "r.signal", tmp_path / "r.label"
    chiron.write_read(sp, lp, sig, ranges, genome)

    raw, event, nuc = load_read_snippets(sp, lp, stride=6)
    sigc, rr, ev, er, nuc2 = load_read_compact(sp, lp, stride=6)
    np.testing.assert_array_equal(nuc, nuc2)
    assert rr.shape[0] == raw.shape[0]

    # reconstruct snippets from compact form on host and compare exactly
    N = rr.shape[0]
    for i in range(0, N, max(1, N // 7)):
        s, e = rr[i]
        n = min(e - s, 200)
        np.testing.assert_array_equal(raw[i, :n, 0], sigc[s : s + n])
        np.testing.assert_array_equal(raw[i, n:, 0], 0.0)
        s2, e2 = er[i]
        m = min(e2 - s2, 30)
        np.testing.assert_array_equal(event[i, :m], ev[s2 : s2 + m])

    # decoded outputs must agree between the two engine paths (f32 wire
    # format is bit-exact; the default f16 transport is covered below)
    cfg = ModelConfig(enc_units=16, dec_units=16, encoder_depth=1, data_type="joint")
    params = init_basecaller(jax.random.PRNGKey(0), cfg)
    engine = BasecallEngine(params, cfg, chunk_size=64, transport_dtype="f32")
    max_len = int((nuc != 0).sum(axis=1).max())
    t1, p1 = engine.predict_beam(raw, event, max_len, 3)
    t2, p2 = engine.predict_beam_compact(sigc, rr, ev, er, max_len, 3)
    np.testing.assert_array_equal(t1, t2)
    np.testing.assert_allclose(p1, p2, rtol=2e-2, atol=1e-3)  # bf16 download

    # default f16 transport: inputs quantized to ~1e-3 relative — decoded
    # tokens must agree on nearly every snippet (beam ties may flip a few
    # rows under these untrained random weights)
    eng16 = BasecallEngine(params, cfg, chunk_size=64)
    t3, _ = eng16.predict_beam_compact(sigc, rr, ev, er, max_len, 3)
    assert (t3 == t2).all(axis=1).mean() > 0.9

    # i8sig transport: signal quantized to i8 (step ~0.8% of range, below
    # pore noise), event features still f16. Untrained random weights
    # amplify quantization chaotically, so assert per-token (not whole-row)
    # agreement; the trained-model identity cost is measured in the bench.
    eng8 = BasecallEngine(params, cfg, chunk_size=64, transport_dtype="i8sig")
    t4, _ = eng8.predict_beam_compact(sigc, rr, ev, er, max_len, 3)
    assert (t4 == t2).mean() > 0.9
    assert (t4 == t2).all(axis=1).mean() > 0.6


def test_pack_u8_fetch_matches_baseline(tmp_path):
    """pack_u8=True (nibble tokens + u8-quantized probs) returns identical
    tokens and probs within the 1/255 quantization step."""
    rng = np.random.default_rng(6)
    genome = simulator.random_genome(1500, rng)
    sig, ranges = simulator.simulate_read(genome, rng, simulator.PoreModel())
    sp, lp = tmp_path / "r.signal", tmp_path / "r.label"
    chiron.write_read(sp, lp, sig, ranges, genome)
    sigc, rr, ev, er, nuc = load_read_compact(sp, lp, stride=6)

    cfg = ModelConfig(enc_units=16, dec_units=16, encoder_depth=1, data_type="joint")
    params = init_basecaller(jax.random.PRNGKey(0), cfg)
    max_len = int((nuc != 0).sum(axis=1).max())
    base = BasecallEngine(params, cfg, chunk_size=64)
    packed = BasecallEngine(params, cfg, chunk_size=64, pack_u8=True)
    t1, p1 = base.predict_beam_compact(sigc, rr, ev, er, max_len, 3)
    t2, p2 = packed.predict_beam_compact(sigc, rr, ev, er, max_len, 3)
    np.testing.assert_array_equal(t1, t2)
    # the packed path clips to [0, 1] (baseline probs can exceed 1 by fp
    # rounding in the post-end fill region, which callers truncate anyway)
    assert np.abs(np.clip(p1, 0, 1) - p2).max() <= 0.5 / 255 + 5e-3


def test_projected_memory_matches_baseline(tmp_path):
    """project_values=True is mathematically equivalent: identical tokens,
    probs equal to fp32 tolerance."""
    rng = np.random.default_rng(4)
    genome = simulator.random_genome(1500, rng)
    sig, ranges = simulator.simulate_read(genome, rng, simulator.PoreModel())
    sp, lp = tmp_path / "r.signal", tmp_path / "r.label"
    chiron.write_read(sp, lp, sig, ranges, genome)
    raw, event, nuc = load_read_snippets(sp, lp, stride=6)

    cfg = ModelConfig(enc_units=16, dec_units=16, encoder_depth=1, data_type="joint")
    params = init_basecaller(jax.random.PRNGKey(0), cfg)
    max_len = int((nuc != 0).sum(axis=1).max())
    base = BasecallEngine(params, cfg, chunk_size=64)
    proj = BasecallEngine(params, cfg, chunk_size=64, project_values=True)
    t1, p1 = base.predict_beam(raw, event, max_len, 3)
    t2, p2 = proj.predict_beam(raw, event, max_len, 3)
    np.testing.assert_array_equal(t1, t2)
    np.testing.assert_allclose(p1, p2, rtol=1e-4, atol=1e-5)


def test_i8dev_device_event_features(tmp_path):
    """The 'i8dev' wire format recomputes scaled event features on device
    from the uploaded signal + u16 event lengths; they must match the host
    features (ravvent_tpu.data.snippets.prepare_compact) closely, and the
    decoded tokens must agree with the f32 wire path."""
    import jax.numpy as jnp

    from ravvent_tpu.data.snippets import load_read_compact_ex
    from ravvent_tpu.evaluation.basecall import _device_event_features

    rng = np.random.default_rng(11)
    genome = simulator.random_genome(2500, rng)
    sig, ranges = simulator.simulate_read(genome, rng, simulator.PoreModel())
    sp, lp = tmp_path / "r.signal", tmp_path / "r.label"
    chiron.write_read(sp, lp, sig, ranges, genome)
    sigc, rr, ev, er, nuc, aux = load_read_compact_ex(sp, lp, stride=6)
    assert aux["contiguous"]

    # --- direct feature parity (whole read as one "slab", i8 signal) ---
    E = aux["ev_lens"].shape[0]
    lo_s = int(rr[0, 0])
    span = int(aux["ev_lens"].sum())
    sl = sigc[lo_s : lo_s + span]
    s_scale = max(float(np.abs(sl).max()), 1e-12) / 127.0
    sl_q = np.clip(np.round(sl / s_scale), -127, 127).astype(np.int8)
    hdr1 = np.zeros(16, np.float32)
    hdr1[0:5] = aux["scaler_mean"]
    hdr1[5:10] = aux["scaler_std"]
    hdr1[10] = aux["raw_mean"]
    hdr1[11] = aux["raw_std"]
    hdr1[12] = ev[0, 1] * aux["scaler_std"][1] + aux["scaler_mean"][1]
    ovr = ev[[0, E - 1]].astype(np.float16)
    feats = np.asarray(
        _device_event_features(
            jnp.asarray(sl_q.astype(np.float32) * s_scale),
            jnp.asarray(aux["ev_lens"].astype(np.int32)),
            jnp.int32(E),
            jnp.asarray(hdr1),
            jnp.asarray(ovr.astype(np.float32)),
        )
    )
    # i8 signal quantization + f32 cumsums: features match to ~1e-2 in
    # scaled units (the scaled features are O(1))
    assert np.abs(feats - ev).max() < 5e-2
    assert np.abs(feats - ev).mean() < 5e-3

    # --- end-to-end: tokens through the i8dev wire vs the f32 wire ---
    cfg = ModelConfig(enc_units=16, dec_units=16, encoder_depth=1, data_type="joint")
    params = init_basecaller(jax.random.PRNGKey(0), cfg)
    max_len = int((nuc != 0).sum(axis=1).max())
    ref_eng = BasecallEngine(params, cfg, chunk_size=64, transport_dtype="f32")
    dev_eng = BasecallEngine(params, cfg, chunk_size=64, transport_dtype="i8dev")
    t_ref, _ = ref_eng.predict_beam_compact(sigc, rr, ev, er, max_len, 3)
    t_dev, _ = dev_eng.predict_beam_compact(sigc, rr, ev, er, max_len, 3, aux=aux)
    assert (t_dev == t_ref).mean() > 0.9
    assert (t_dev == t_ref).all(axis=1).mean() > 0.6


def test_device_snippet_ranges_match_host(tmp_path):
    """_device_snippet_ranges (i8dev wire) must reproduce the host's snippet
    event/raw index ranges exactly (integer arithmetic both sides)."""
    import jax.numpy as jnp

    from ravvent_tpu.data.snippets import load_read_compact_ex
    from ravvent_tpu.evaluation.basecall import _device_snippet_ranges

    rng = np.random.default_rng(21)
    genome = simulator.random_genome(2000, rng)
    sig, ranges = simulator.simulate_read(genome, rng, simulator.PoreModel())
    sp, lp = tmp_path / "r.signal", tmp_path / "r.label"
    chiron.write_read(sp, lp, sig, ranges, genome)
    sigc, rr, ev, er, nuc, aux = load_read_compact_ex(sp, lp, stride=6)
    N = rr.shape[0]
    lo_s = int(rr[0, 0])
    n_rows = ((N + 63) // 64) * 64
    E = aux["ev_lens"].shape[0]
    rr_d, er_d = _device_snippet_ranges(
        jnp.asarray(aux["ev_lens"].astype(np.int32)),
        jnp.int32(N), jnp.int32(E), n_rows, int(aux["stride"]),
    )
    rr_d, er_d = np.asarray(rr_d), np.asarray(er_d)
    np.testing.assert_array_equal(er_d[:N], er)
    np.testing.assert_array_equal(rr_d[:N], rr - lo_s)
    assert (rr_d[N:] == 0).all() and (er_d[N:] == 0).all()

    # The packed wire zero-pads the length section: results must be
    # identical with a padded tail (end-of-read windows must stop at n_ev,
    # not run into the padding — regression for the cumsum-plateau bug).
    lens_pad = np.zeros(E + 300, np.int32)
    lens_pad[:E] = aux["ev_lens"]
    rr_p, er_p = _device_snippet_ranges(
        jnp.asarray(lens_pad), jnp.int32(N), jnp.int32(E), n_rows,
        int(aux["stride"]),
    )
    np.testing.assert_array_equal(np.asarray(er_p), er_d)
    np.testing.assert_array_equal(np.asarray(rr_p), rr_d)


def test_prob_bits4_fetch_matches_baseline(tmp_path):
    """prob_bits=4 (nibble-packed step probs) returns identical tokens and
    probs within the 1/15 quantization step."""
    rng = np.random.default_rng(11)
    genome = simulator.random_genome(1500, rng)
    sig, ranges = simulator.simulate_read(genome, rng, simulator.PoreModel())
    sp, lp = tmp_path / "r.signal", tmp_path / "r.label"
    chiron.write_read(sp, lp, sig, ranges, genome)
    sigc, rr, ev, er, nuc = load_read_compact(sp, lp, stride=6)

    cfg = ModelConfig(enc_units=16, dec_units=16, encoder_depth=1, data_type="joint")
    params = init_basecaller(jax.random.PRNGKey(0), cfg)
    max_len = int((nuc != 0).sum(axis=1).max())
    base = BasecallEngine(params, cfg, chunk_size=64)
    packed = BasecallEngine(params, cfg, chunk_size=64, pack_u8=True, prob_bits=4)
    t1, p1 = base.predict_beam_compact(sigc, rr, ev, er, max_len, 3)
    t2, p2 = packed.predict_beam_compact(sigc, rr, ev, er, max_len, 3)
    np.testing.assert_array_equal(t1, t2)
    assert np.abs(np.clip(p1, 0, 1) - p2).max() <= 0.5 / 15 + 5e-3


def test_pipelined_evaluator_runs_and_counts(tmp_path):
    """run_pipelined overlaps reads via dispatch/collect; outputs (merged
    sequences) must match the sequential path, and the aggregate record must
    count every read's bases/samples."""
    from ravvent_tpu.evaluation.performance import PerformanceEvaluator

    rng = np.random.default_rng(21)
    genome = simulator.random_genome(2000, rng)
    paths = []
    total_bases = 0
    for i in range(3):
        sig, ranges = simulator.simulate_read(genome, rng, simulator.PoreModel())
        sp, lp = tmp_path / f"r{i}.signal", tmp_path / f"r{i}.label"
        chiron.write_read(sp, lp, sig, ranges, genome)
        paths.append(str(sp))
        total_bases += len(genome)

    cfg = ModelConfig(enc_units=16, dec_units=16, encoder_depth=1, data_type="joint")
    params = init_basecaller(jax.random.PRNGKey(0), cfg)
    engine = BasecallEngine(params, cfg, chunk_size=64)

    # dispatch/collect split must equal the one-shot call
    sigc, rr, ev, er, nuc = load_read_compact(paths[0], tmp_path / "r0.label", stride=6)
    max_len = int((nuc != 0).sum(axis=1).max())
    t1, p1 = engine.predict_beam_compact(sigc, rr, ev, er, max_len, 3)
    h = engine.dispatch_beam_compact(sigc, rr, ev, er, max_len, 3)
    t2, p2 = engine.collect_beam_compact(h)
    np.testing.assert_array_equal(t1, t2)
    np.testing.assert_array_equal(p1, p2)

    pe = PerformanceEvaluator(engine, beam_width=3, cache_dir=str(tmp_path / "c"))

    # capture each read's merged sequence from both paths: overlapped
    # execution must not change what comes out of the merge fold
    def capturing(store):
        orig = pe.merger.merge_flat

        def wrapped(*a, **k):
            out = orig(*a, **k)
            store.append(out.seq)
            return out

        return orig, wrapped

    seq_sequential = []
    orig, pe.merger.merge_flat = capturing(seq_sequential)
    for p in paths:
        pe.run(p)
    pe.merger.merge_flat = orig

    seq_pipelined = []
    orig, pe.merger.merge_flat = capturing(seq_pipelined)
    rec = pe.run_pipelined(paths, inflight=2)
    pe.merger.merge_flat = orig

    # finisher threads complete out of order; compare as multisets
    assert sorted(seq_pipelined) == sorted(seq_sequential)
    assert rec["pipelined"] and rec["reads"] == 3
    assert rec["bases_num"] == total_bases
    assert rec["samples_num"] > 0 and rec["bases_per_s"] > 0


def test_gather_rows_matches_naive():
    """gather_rows (block gather + shift tree) must equal the naive
    clip-and-mask gather bit-for-bit, including rows that run past the
    source end and zero-length rows."""
    from ravvent_tpu.ops.gather_rows import gather_rows

    rng = np.random.default_rng(3)
    for S, N, L in [(5000, 64, 200), (997, 16, 150), (300, 8, 30)]:
        src = rng.normal(size=S).astype(np.float32)
        starts = rng.integers(0, S, N)
        starts[0] = 0
        starts[-1] = S - 1  # runs past the end
        lens = rng.integers(0, L + 1, N)
        lens[1] = 0
        out = np.asarray(gather_rows(
            jnp.asarray(src), jnp.asarray(starts), jnp.asarray(lens), L))
        srcp = np.pad(src, (0, L + 128))
        ref = np.zeros((N, L), np.float32)
        for n in range(N):
            ref[n, :lens[n]] = srcp[starts[n]:starts[n] + lens[n]]
        np.testing.assert_array_equal(out, ref)


def test_pipelined_sigdev_matches_sequential(tmp_path):
    """Pipelined sigdev (split begin/finish dispatch: the meta round-trip
    hides behind the next read's load) must produce the same merged
    sequences as sequential sigdev runs."""
    from ravvent_tpu.evaluation.performance import PerformanceEvaluator

    rng = np.random.default_rng(33)
    genome = simulator.random_genome(1500, rng)
    paths = []
    for i in range(3):
        sig, ranges = simulator.simulate_read(genome, rng, simulator.PoreModel())
        sp, lp = tmp_path / f"r{i}.signal", tmp_path / f"r{i}.label"
        chiron.write_read(sp, lp, sig, ranges, genome)
        paths.append(str(sp))

    cfg = ModelConfig(enc_units=16, dec_units=16, encoder_depth=1, data_type="joint")
    params = init_basecaller(jax.random.PRNGKey(0), cfg)
    engine = BasecallEngine(params, cfg, chunk_size=64)

    # split API == one-shot API
    raw = chiron.load_signal(paths[0])
    h1 = engine.dispatch_beam_signal(raw, beam_width=3)
    t1, p1 = engine.collect_beam_compact(h1)
    h2 = engine.finish_beam_signal(engine.begin_beam_signal(raw), beam_width=3)
    t2, p2 = engine.collect_beam_compact(h2)
    np.testing.assert_array_equal(t1, t2)
    np.testing.assert_array_equal(p1, p2)

    pe = PerformanceEvaluator(engine, beam_width=3,
                              cache_dir=str(tmp_path / "c"), wire="sigdev")

    def capturing(store):
        orig = pe.merger.merge_flat

        def wrapped(*a, **k):
            out = orig(*a, **k)
            store.append(out.seq)
            return out

        return orig, wrapped

    # sequential sigdev reference (run() is the compact-path reference
    # timing contract, so build the sigdev baseline from the engine API);
    # uses the device snippet ranges like the pipelined path — the sigdev
    # merge carries the positional prior since round 5
    from ravvent_tpu.assembly.merger import expected_overlaps_from_ranges

    seq_sequential = []
    for p in paths:
        tokens, probs, rr_h = engine.predict_beam_signal(
            chiron.load_signal(p), beam_width=3, return_ranges=True)
        blob, offsets, flat_probs = pe._postprocess(tokens, probs)
        eo = (expected_overlaps_from_ranges(rr_h, np.diff(offsets))
              if rr_h is not None and rr_h.shape[0] > 1 else None)
        seq_sequential.append(
            pe.merger.merge_flat(blob, offsets, flat_probs,
                                 expected_overlaps=eo).seq)

    seq_pipelined = []
    orig, pe.merger.merge_flat = capturing(seq_pipelined)
    rec = pe.run_pipelined(paths, inflight=2)
    pe.merger.merge_flat = orig

    assert sorted(seq_pipelined) == sorted(seq_sequential)
    assert rec["wire"] == "sigdev" and rec["reads"] == 3
