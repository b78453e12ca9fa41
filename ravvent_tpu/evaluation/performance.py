"""Throughput evaluation with the reference's 4-way timing partition.

Rebuild of the reference performance evaluator
(reference: ravvent_performance_evaluator.py): per read, wall-clock timers
partition the pipeline into ``t_data_loading`` / ``t_predicting`` /
``t_postprocessing`` / ``t_merge``; throughput = bases (or samples) /
``total_processing`` (prediction + postprocessing + merge, excluding data
loading) (ravvent_performance_evaluator.py:78-87,125-129). Aggregation
reproduces ``compute_total_results`` including its running-cumulative-mean
behavior (ravvent_performance_evaluator.py:109-131).
"""

from __future__ import annotations

import json
import os
from pathlib import Path
from timeit import default_timer as timer
from typing import Dict, List, Optional

import numpy as np

from ravvent_tpu.assembly.merger import Merger, expected_overlaps_from_ranges
from ravvent_tpu.data import chiron
from ravvent_tpu.data.snippets import load_read_compact_ex
from ravvent_tpu.evaluation.basecall import BasecallEngine


class PerformanceEvaluator:
    def __init__(
        self,
        engine: BasecallEngine,
        merger_scores_id: int = 0,
        stride: int = 6,
        beam_width: int = 5,
        cache_dir: Optional[str] = None,
        wire: str = "compact",
        conf_gate="default",
    ) -> None:
        self.merger = Merger(scores_id=merger_scores_id)
        # drop derailed low-confidence snippets before the fold, same rule
        # as the identity path (assembly.merger.confidence_keep_mask) so the
        # timed workload matches what production merges
        if conf_gate == "default":
            from ravvent_tpu.assembly.merger import CONF_GATE_DEFAULT

            conf_gate = CONF_GATE_DEFAULT
        self.conf_gate = conf_gate
        self.stride = stride
        self.engine = engine
        self.beam_width = beam_width
        self.cache_dir = cache_dir
        # "sigdev": dispatch the raw i16 signal only; segmentation/features/
        # ranges run on device (engine.dispatch_beam_signal). The merge then
        # runs without the raw-range positional prior (host never sees the
        # ranges), and t_data_loading drops to a raw-signal file read.
        assert wire in ("compact", "sigdev", "sigdev8")
        # "sigdev8": u8 window-quantized signal (half the upload; boundary
        # agreement 97.3%, aggregate-identity-neutral — PERFORMANCE.md e21)
        self.sig_wire = "u8" if wire == "sigdev8" else "i16"
        self.wire = wire

    def run(self, signal_data_source, chunk_size: int = 1024) -> Dict:
        label_path = Path(signal_data_source).with_suffix(".label")
        ranges, syms = chiron.load_label(label_path)
        ref_seq = "".join(syms)
        samples_num = int(ranges[-1, 1] - ranges[0, 0])

        start = timer()
        sig, rr, ev, er, nuc, aux = load_read_compact_ex(
            signal_data_source, label_path, self.stride, cache_dir=self.cache_dir
        )
        t_data_loading = timer() - start

        max_output_len = int((nuc != 0).sum(axis=1).max()) if rr.shape[0] else 2

        t_predicting = 0.0
        t_postprocessing = 0.0
        if rr.shape[0]:
            # Compact path: one (or few) device dispatches per read, with
            # on-device snippet construction; dispatches are pipelined before
            # results are materialized.
            start = timer()
            tokens, probs = self.engine.predict_beam_compact(
                sig, rr, ev, er, max_output_len, self.beam_width, aux=aux
            )
            t_predicting = timer() - start

            start = timer()
            blob, offsets, flat_probs = self._postprocess(tokens, probs)
            t_postprocessing = timer() - start

        start = timer()
        if rr.shape[0]:
            blob, offsets, flat_probs, rr = self._gate(
                blob, offsets, flat_probs, rr)
            eo = (expected_overlaps_from_ranges(rr, np.diff(offsets))
                  if rr.shape[0] > 1 else None)
            self.merger.merge_flat(blob, offsets, flat_probs,
                                   expected_overlaps=eo)
        t_merge = timer() - start

        return {
            "bases_num": len(ref_seq),
            "samples_num": samples_num,
            "t_data_loading": t_data_loading,
            "t_predicting": t_predicting,
            "t_postprocessing": t_postprocessing,
            "t_merge": t_merge,
            "total": t_data_loading + t_predicting + t_postprocessing + t_merge,
            "total_processing": t_predicting + t_postprocessing + t_merge,
        }

    def _dispatch_compact(self, path, label_path):
        sig, rr, ev, er, nuc, aux = load_read_compact_ex(
            path, label_path, self.stride, cache_dir=self.cache_dir)
        max_output_len = int((nuc != 0).sum(axis=1).max()) if rr.shape[0] else 2
        return self.engine.dispatch_beam_compact(
            sig, rr, ev, er, max_output_len, self.beam_width, aux=aux)

    def _gate(self, blob, offsets, flat_probs, rr):
        """Confidence gate over the flat snippet layout (see
        assembly.merger.confidence_keep_mask); no-op when disabled or when
        nothing trips the gate."""
        if self.conf_gate is None or offsets.size <= 2:
            return blob, offsets, flat_probs, rr
        from ravvent_tpu.assembly.merger import (
            confidence_keep_mask, drop_snippet_rows,
        )

        keep = confidence_keep_mask(flat_probs, offsets, *self.conf_gate)
        if not keep.all():
            blob, offsets, flat_probs = drop_snippet_rows(
                blob, offsets, flat_probs, keep)
            if rr is not None and rr.shape[0] == keep.shape[0]:
                rr = rr[keep]
        return blob, offsets, flat_probs, rr

    @staticmethod
    def _postprocess(tokens, probs):
        """Flat postprocessing: one vectorized token->ASCII compress for the
        whole read; per-snippet scores are the first len(seq) probs of each
        row (reference: logits[:len(seq)] slicing) selected by a prefix mask
        — no per-row Python work."""
        from ravvent_tpu.tokenizer import NUC_TOKENIZER

        seqs, blob, offsets = NUC_TOKENIZER.sequences_to_texts_flat(tokens)
        probs = np.asarray(probs, dtype=np.float64)
        counts = np.diff(offsets)
        prefix = np.arange(probs.shape[1])[None, :] < counts[:, None]
        flat_probs = probs[prefix]
        return blob, offsets, flat_probs

    def run_pipelined(self, signal_paths, chunk_size: int = 1024,
                      inflight: int = 8, finishers: int = 4,
                      seg_batch: int = 1) -> Dict:
        """Process a list of reads as a pipeline: the main thread loads and
        dispatches read k+1 while read k computes on the device and a small
        completion pool fetches/postprocesses/merges finished reads. Reads
        are independent (one merge fold per read), the native merge and the
        device-copy wait both release the GIL, so completions run
        concurrently with dispatch AND with each other — steady state is
        max(load+dispatch, device, merge/finishers) instead of their sum.

        The per-read 4-way timing partition cannot be attributed under
        overlap, so this returns ONE aggregate record (wall time over the
        whole batch of reads) — the production throughput number. The
        sequential :meth:`run` remains the reference-parity timing contract
        (ravvent_performance_evaluator.py:32-87 measures reads one at a
        time; the reference has no pipelining to mirror).

        ``inflight`` bounds outstanding dispatched reads (device queue +
        completion backlog); ``finishers`` sizes the completion pool.
        """
        import threading
        from collections import deque
        from concurrent.futures import ThreadPoolExecutor

        bases_num = samples_num = 0
        stages = {"load": 0.0, "dispatch": 0.0, "collect_wait": 0.0,
                  "postproc": 0.0, "merge": 0.0}
        stages_lock = threading.Lock()

        def add_stage(key, dt):
            with stages_lock:
                stages[key] += dt

        def finish(handle, rr_h):
            # Runs on a pool thread: blocks on the device->host copy, then
            # does this read's host postprocessing + merge fold.
            t0 = timer()
            tokens, probs = self.engine.collect_beam_compact(handle)
            t1 = timer()
            add_stage("collect_wait", t1 - t0)
            if tokens.shape[0]:
                blob, offsets, flat_probs = self._postprocess(tokens, probs)
                t2 = timer()
                add_stage("postproc", t2 - t1)
                if rr_h is not None and rr_h.shape[0] == offsets.size - 1:
                    blob, offsets, flat_probs, rr_h = self._gate(
                        blob, offsets, flat_probs, rr_h)
                eo = (expected_overlaps_from_ranges(rr_h, np.diff(offsets))
                      if rr_h is not None and rr_h.shape[0] > 1
                      and rr_h.shape[0] == offsets.size - 1 else None)
                self.merger.merge_flat(blob, offsets, flat_probs,
                                       expected_overlaps=eo)
                add_stage("merge", timer() - t2)

        start_all = timer()
        pending = deque()
        seg_q = deque()  # sigdev: segmentations whose meta is still in flight
        raw_q = []  # sigdev: reads awaiting a batched segmentation dispatch

        def finish_seg(seg, path, label_path):
            # complete a deferred sigdev dispatch (meta has had a read's
            # worth of load/upload time to arrive — the round-trip hides)
            t1 = timer()
            handle = self.engine.finish_beam_signal(
                seg, beam_width=self.beam_width)
            add_stage("dispatch", timer() - t1)
            if handle is None:  # segmentation overflow: host path
                handle = self._dispatch_compact(path, label_path)
                pending.append(pool.submit(finish, handle, None))
                return
            rr_h = None
            if isinstance(seg, tuple) and len(seg) == 6:
                n_snip = int(np.asarray(seg[4])[1])
                rr_h = np.asarray(seg[2])[:n_snip]  # async copy, arrived
            elif isinstance(seg, tuple) and len(seg) == 7:  # batched row
                k = seg[6]
                n_snip = int(np.asarray(seg[4])[k][1])
                rr_h = np.asarray(seg[2])[k][:n_snip]
            pending.append(pool.submit(finish, handle, rr_h))

        with ThreadPoolExecutor(max_workers=max(1, finishers)) as pool:
            for path in signal_paths:
                t0 = timer()
                label_path = Path(path).with_suffix(".label")
                if self.wire.startswith("sigdev"):
                    raw = chiron.load_signal(path)
                    ranges, _ = chiron.load_label(label_path)
                    bases_num += int(ranges.shape[0])
                    samples_num += int(raw.size)
                    stages["load"] += timer() - t0
                    # seg_batch>1 batches K reads' segmentation into ONE
                    # upload + ONE program call (engine
                    # begin_beam_signal_batch, bit-parity-tested). Measured
                    # on the bench tunnel it LOSES (261k -> 217-239k
                    # bases/s): padding every read to the batch-max bucket
                    # and the delayed pipeline start outweigh the saved
                    # call overhead, and the remaining dispatch stage time
                    # is host CPU/GIL contention with the finisher threads
                    # rather than call latency (docs/PERFORMANCE.md entry
                    # 24). Default stays per-read; the batched path exists
                    # for locally-attached devices / many-tiny-read
                    # workloads where the trade flips.
                    raw_q.append((raw, path, label_path))
                    if len(raw_q) >= max(1, seg_batch):
                        t1 = timer()
                        segs = self.engine.begin_beam_signal_batch(
                            [r for r, _, _ in raw_q], stride=self.stride,
                            sig_wire=self.sig_wire)
                        stages["dispatch"] += timer() - t1
                        for s, (_, p_, lp_) in zip(segs, raw_q):
                            seg_q.append((s, p_, lp_))
                        raw_q.clear()
                    # the queued batch provides the lag that hides the
                    # meta link round-trip
                    while len(seg_q) >= 2:
                        finish_seg(*seg_q.popleft())
                    while len(pending) >= inflight:
                        pending.popleft().result()
                    continue
                sig, rr, ev, er, nuc, aux = load_read_compact_ex(
                    path, label_path, self.stride, cache_dir=self.cache_dir
                )
                bases_num += aux["n_bases"]
                samples_num += aux["n_samples"]
                max_output_len = (
                    int((nuc != 0).sum(axis=1).max()) if rr.shape[0] else 2
                )
                t1 = timer()
                stages["load"] += t1 - t0
                handle = self.engine.dispatch_beam_compact(
                    sig, rr, ev, er, max_output_len, self.beam_width, aux=aux
                )
                stages["dispatch"] += timer() - t1
                pending.append(pool.submit(finish, handle, rr))
                while len(pending) >= inflight:
                    pending.popleft().result()
            if raw_q:  # tail flush: dispatch the final partial batch
                t1 = timer()
                segs = self.engine.begin_beam_signal_batch(
                    [r for r, _, _ in raw_q], stride=self.stride,
                    sig_wire=self.sig_wire)
                stages["dispatch"] += timer() - t1
                for s, (_, p_, lp_) in zip(segs, raw_q):
                    seg_q.append((s, p_, lp_))
                raw_q.clear()
            while seg_q:
                finish_seg(*seg_q.popleft())
            while pending:
                pending.popleft().result()
        wall = timer() - start_all

        return {
            "pipelined": True,
            "wire": self.wire,
            "reads": len(signal_paths),
            "inflight": inflight,
            "finishers": finishers,
            "bases_num": bases_num,
            "samples_num": samples_num,
            "wall_s": wall,
            "bases_per_s": bases_num / wall if wall else 0.0,
            "samples_per_s": samples_num / wall if wall else 0.0,
            # stage totals summed across threads (overlapping time counts
            # once per stage); collect_wait = blocked-on-device time
            "stages_s": {k: round(v, 5) for k, v in stages.items()},
        }

    @staticmethod
    def compute_total_results(results_path) -> tuple:
        """reference: ravvent_performance_evaluator.py:109-131 (the running
        cumulative means are reproduced as-is)."""
        with open(results_path, "rt") as f:
            results = json.load(f)
        bases_num = samples_num = 0
        t_processing = 0.0
        bases_speeds, signals_speeds = [], []
        for res in results:
            bases_num += res["bases_num"]
            samples_num += res["samples_num"]
            t_processing += res["total_processing"]
            bases_speeds.append(bases_num / t_processing)
            signals_speeds.append(samples_num / t_processing)
        return (
            float(np.mean(bases_speeds)),
            float(np.std(signals_speeds)),
            float(np.mean(signals_speeds)),
            float(np.std(signals_speeds)),
        )

    def evaluate_files(
        self, files_info_path, results_path, verbose: bool = True, repeats: int = 1
    ) -> List[Dict]:
        """Per-read timing sweep with incremental JSON flushing. ``repeats``
        re-runs each read and keeps the fastest measurement — steady-state
        throughput on shared/remote-attached devices whose transport load
        varies over time."""
        with open(files_info_path, "rt") as f:
            val_files = [v["signal_path"] for v in json.load(f)]
        os.makedirs(os.path.dirname(str(results_path)) or ".", exist_ok=True)
        results: List[Dict] = []
        for v in val_files:
            if verbose:
                print(f"Running {v}", flush=True)
            res = min(
                (self.run(v) for _ in range(max(1, repeats))),
                key=lambda r: r["total_processing"],
            )
            res["path"] = v
            results.append(res)
            with open(results_path, "wt") as f:
                json.dump(results, f, indent=2)
        return results
