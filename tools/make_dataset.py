"""Build the canonical simulated datasets (train/val/test chiron files).

Replaces the reference's external DeepSimulator data-generation pipeline
(reference: data/generate_simulated_from_chiron.py,
data/generate_simulator_reduced.py) with the built-in simulator. Datasets are
deterministic in their seeds, so they are reproduced rather than committed.

Usage:
  python tools/make_dataset.py --out datasets/sim_lambda [--n-kmers 0]
  (--n-kmers K > 0 uses a reduced K-base-kmer vocabulary genome like the
  reference's reduced sets; 0 = unrestricted random genome)
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np

from ravvent_tpu.data import chiron, simulator


def build(out_dir, n_kmers=0, genome_len=300_000, train_reads=24, eval_reads=8,
          read_len=(6000, 10000), noise_std=9.0, seed=7):
    out = Path(out_dir)
    rng = np.random.default_rng(seed)
    if n_kmers > 0:
        genome = simulator.generate_reduced_genome(n_kmers, genome_len, rng)
    else:
        genome = simulator.random_genome(genome_len, rng)
    simulator.write_fasta(out / "genome.fasta", f"sim.{n_kmers}.{genome_len}", genome) \
        if out.mkdir(parents=True, exist_ok=True) is None else None

    simulator.generate_chiron_dataset(
        out / "train", genome, n_reads=train_reads, read_len_range=read_len,
        seed=seed + 1, noise_std=noise_std,
    )
    simulator.generate_chiron_dataset(
        out / "eval", genome, n_reads=eval_reads, read_len_range=read_len,
        seed=seed + 2, noise_std=noise_std,
    )
    fi_train = chiron.create_files_info(out / "train", stride=6, verbose=False)
    fi_eval = chiron.create_files_info(out / "eval", stride=6, verbose=False)
    # reference-style val/test split of the eval set (data_loader.py:158-177)
    eval_named = (out / "eval" / "files_info.eval.snippets.stride_6.json")
    eval_named.write_text(Path(fi_eval).read_text())
    val_path, test_path = chiron.split_eval_files_info_into_test_validation(
        0.25, str(eval_named), seed=seed
    )
    print(f"train index: {fi_train}")
    print(f"val index:   {val_path}")
    print(f"test index:  {test_path}")
    return fi_train, val_path, test_path


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="datasets/sim_lambda")
    ap.add_argument("--n-kmers", type=int, default=43)
    ap.add_argument("--genome-len", type=int, default=300_000)
    ap.add_argument("--train-reads", type=int, default=24)
    ap.add_argument("--eval-reads", type=int, default=8)
    ap.add_argument("--noise-std", type=float, default=9.0)
    ap.add_argument("--seed", type=int, default=7)
    args = ap.parse_args()
    build(args.out, args.n_kmers, args.genome_len, args.train_reads,
          args.eval_reads, noise_std=args.noise_std, seed=args.seed)
