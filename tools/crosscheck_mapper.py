"""External validation harness for the built-in sce mapper.

minimap2 defines the identity metric of record
(reference: ravvent_mapping_evaluator.py:85-108: ``minimap2 -x map-ont -c``,
identity = sum(PAF matches) / sum(PAF block_len)) but is not installable in
this environment, so the framework's metric of record is the built-in
seed-chain-extend local mapper (ravvent_tpu.assembly.sce_mapper). This tool
makes the substitution externally checkable in one command on ANY machine
that has minimap2:

  python tools/crosscheck_mapper.py                 # self-check vs committed
  python tools/crosscheck_mapper.py --minimap2      # also diff vs real minimap2

Fixtures (committed, deterministic — regenerate with --regen):
  tests/fixtures/crosscheck/ref.fasta       reference sequences per case
  tests/fixtures/crosscheck/pred.fastq      predicted reads (map-ont-style
                                            error profile: ~12% err, garbage
                                            tails, a reverse-complement read,
                                            a split read, unmappable garbage)
  tests/fixtures/crosscheck/expected.json   the sce mapper's committed
                                            (matches, block_len, identity)
                                            per case

Self-check: the sce mapper's current output must equal expected.json
(guards the mapper against silent behavior drift). minimap2 check: per-case
identity deltas are printed; flags cases where |Δidentity| > 0.03 — seed
heuristics differ, so small deltas are expected, large ones are bugs.
"""

from __future__ import annotations

import argparse
import json
import shutil
import subprocess
import sys
import tempfile
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

import numpy as np

FIXTURES = REPO / "tests" / "fixtures" / "crosscheck"

BASES = "ACGT"


def _mutate(rng, seq, sub=0.06, ins=0.03, dele=0.03):
    out = []
    for c in seq:
        r = rng.random()
        if r < dele:
            continue
        if r < dele + sub:
            out.append(BASES[rng.integers(4)])
        else:
            out.append(c)
        if rng.random() < ins:
            out.append(BASES[rng.integers(4)])
    return "".join(out)


def _rand(rng, n):
    return "".join(BASES[i] for i in rng.integers(0, 4, n))


def build_cases():
    """Deterministic (ref, pred) pairs spanning map-ont behaviors."""
    from ravvent_tpu.assembly.sce_mapper import revcomp

    rng = np.random.default_rng(20260820)
    ref = _rand(rng, 20000)
    cases = {}
    # 1: plain read, ~12% error (the typical basecalled read)
    cases["plain"] = (ref, _mutate(rng, ref[2000:10000]))
    # 2: garbage tail (soft-clip semantics)
    cases["garbage_tail"] = (ref, _mutate(rng, ref[5000:11000]) + _rand(rng, 900))
    # 3: reverse-complement read (strand handling)
    cases["revcomp"] = (ref, _mutate(rng, revcomp(ref[3000:9000])))
    # 4: split read: two distant segments joined (split mapping / chimera)
    cases["split"] = (
        ref, _mutate(rng, ref[1000:4000]) + _mutate(rng, ref[14000:17000]))
    # 5: unmappable garbage (must count as invalid / unmapped)
    cases["garbage"] = (ref, _rand(rng, 3000))
    # 6: high-accuracy read (~2% error)
    cases["clean"] = (ref, _mutate(rng, ref[8000:16000], 0.01, 0.005, 0.005))
    # 7: low-accuracy read (~35% error) — below the k=15 seed cliff; graded
    # by the round-4 exact-DP rescue stage (minimap2 map-ont may or may not
    # map it; the --minimap2 diff prints both sides for comparison)
    cases["low_acc"] = (ref, _mutate(rng, ref[4000:8000], 0.21, 0.09, 0.09))
    # 8: repetitive reference (period-6, occurrence-cap seed starvation) —
    # the coverage-triggered rescue path
    rep = ("ACGTGA" * 1200)[:7000]
    cases["repetitive"] = (rep, _mutate(rng, rep[500:6500], 0.02, 0.01, 0.01))
    return cases


def write_fixtures():
    from ravvent_tpu.assembly.sce_mapper import map_identity

    FIXTURES.mkdir(parents=True, exist_ok=True)
    cases = build_cases()
    expected = {}
    with open(FIXTURES / "ref.fasta", "wt") as fa, \
            open(FIXTURES / "pred.fastq", "wt") as fq:
        for name, (ref, pred) in cases.items():
            fa.write(f">{name}\n")
            for i in range(0, len(ref), 80):
                fa.write(ref[i : i + 80] + "\n")
            fq.write(f"@{name}\n{pred}\n+\n" + "!" * len(pred) + "\n")
            expected[name] = map_identity(pred, ref)
    (FIXTURES / "expected.json").write_text(json.dumps(expected, indent=2))
    print(f"wrote fixtures + expected.json under {FIXTURES}")


def read_fixtures():
    from ravvent_tpu.data.simulator import read_fasta

    refs = dict(read_fasta(FIXTURES / "ref.fasta"))
    preds = {}
    lines = (FIXTURES / "pred.fastq").read_text().splitlines()
    for i in range(0, len(lines), 4):
        preds[lines[i][1:]] = lines[i + 1]
    expected = json.loads((FIXTURES / "expected.json").read_text())
    return refs, preds, expected


def self_check() -> int:
    from ravvent_tpu.assembly.sce_mapper import map_identity

    refs, preds, expected = read_fixtures()
    bad = 0
    for name in expected:
        got = map_identity(preds[name], refs[name])
        exp = expected[name]
        same = all(got[k] == exp[k] for k in
                   ("matches", "total_block_len", "read_length"))
        print(f"  {name:13s} identity={got['identity']:.4f} "
              f"matches={got['matches']} block={got['total_block_len']} "
              f"{'OK' if same else 'MISMATCH vs expected.json'}")
        bad += 0 if same else 1
    return bad


def minimap2_check() -> int:
    if shutil.which("minimap2") is None:
        print("minimap2 not on PATH — skipping external check "
              "(run this on a machine that has it)")
        return 0
    refs, preds, expected = read_fixtures()
    bad = 0
    with tempfile.TemporaryDirectory() as td:
        for name in expected:
            fa = Path(td) / "ref.fasta"
            fq = Path(td) / "pred.fastq"
            fa.write_text(f">{name}\n{refs[name]}\n")
            fq.write_text(f"@{name}\n{preds[name]}\n+\n" + "!" * len(preds[name]))
            paf = subprocess.run(
                ["minimap2", "-x", "map-ont", "-c", str(fa), str(fq)],
                capture_output=True, text=True).stdout
            matches = blocks = 0
            for line in paf.splitlines():
                parts = line.split("\t")
                if len(parts) >= 11:
                    matches += int(parts[9])
                    blocks += int(parts[10])
            mm = matches / blocks if blocks else 0.0
            ours = expected[name]["identity"]
            delta = abs(mm - ours)
            flag = "OK" if (delta <= 0.03 or (blocks == 0) ==
                            (expected[name]["read_length"] == 0)) else "DIVERGES"
            print(f"  {name:13s} sce={ours:.4f} minimap2={mm:.4f} "
                  f"Δ={delta:.4f} {flag}")
            bad += flag == "DIVERGES"
    return bad


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--regen", action="store_true",
                    help="regenerate fixtures + expected.json")
    ap.add_argument("--minimap2", action="store_true",
                    help="also diff against a real minimap2 binary")
    args = ap.parse_args()
    if args.regen:
        write_fixtures()
        return 0
    print("sce mapper self-check vs committed expected.json:")
    bad = self_check()
    if args.minimap2:
        print("cross-check vs minimap2 -x map-ont -c:")
        bad += minimap2_check()
    print("PASS" if bad == 0 else f"FAIL ({bad} mismatches)")
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main())
