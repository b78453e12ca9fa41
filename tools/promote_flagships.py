"""Promote matrix3 cells to the flagship checkpoints when they win.

The bench flagship is the (2,1) joint model (checkpoints/flagship) and the
accuracy flagship is the (3,2) joint model (checkpoints/flagship32). The
round-3 matrix retrains every cell from scratch with full data coverage
(the round-2 checkpoints were trained on ~25% of the data due to the
generator cursor bug); this tool compares held-out val identity from the
curriculum summaries and copies the better checkpoint into place.

  python tools/promote_flagships.py [--dry-run]
"""

from __future__ import annotations

import argparse
import json
import shutil
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]

PAIRS = [
    # (candidate ckpt, candidate summary, target ckpt)
    ("checkpoints/matrix3/d21_joint", "runs/m3.joint.d21/curriculum_summary.json",
     "checkpoints/flagship"),
    ("checkpoints/matrix3/d32_joint", "runs/m3.joint.d32/curriculum_summary.json",
     "checkpoints/flagship32"),
]

# round-2 flagship held-out val identities (docs/STATUS round 2 / summaries)
INCUMBENT = {"checkpoints/flagship": 74.5, "checkpoints/flagship32": 87.6}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dry-run", action="store_true")
    args = ap.parse_args()
    for cand, summary, target in PAIRS:
        cp, sp, tp = REPO / cand, REPO / summary, REPO / target
        if not cp.exists() or not sp.exists():
            print(f"{cand}: not trained yet — skip")
            continue
        s = json.loads(sp.read_text())
        new_id = s.get("best_val_identity")
        old_id = INCUMBENT.get(target, None)
        print(f"{target}: incumbent {old_id} vs candidate {new_id} "
              f"(epoch {s.get('best_epoch')})")
        if new_id is None or (old_id is not None and new_id <= old_id):
            print("  keep incumbent")
            continue
        if args.dry_run:
            print(f"  would promote {cand} -> {target}")
            continue
        bak = tp.with_name(tp.name + ".r2")
        if tp.exists() and not bak.exists():
            tp.rename(bak)
        shutil.copytree(cp, tp)
        print(f"  promoted {cand} -> {target} (old kept at {bak.name})")


if __name__ == "__main__":
    main()
