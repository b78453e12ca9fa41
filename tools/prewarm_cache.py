"""Prewarm a dataset's snippet cache on the CPU.

Training epochs pay per-file preprocessing (event detection + snippet
construction) on first visit; for 150-file datasets that is minutes of
TPU-idle warmup. Running this on the host in parallel with training on
ANOTHER dataset hides the cost entirely.

  python tools/prewarm_cache.py datasets/lad2048_noisy [...]
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

from ravvent_tpu.data.snippets import load_read_snippets  # noqa: E402


def prewarm(ds: Path) -> int:
    cache = ds / ".cache"
    n = 0
    for fi in sorted(ds.glob("*/files_info*.json")):
        try:
            entries = json.loads(fi.read_text())
        except json.JSONDecodeError:
            continue
        if not isinstance(entries, list):
            continue
        for e in entries:
            load_read_snippets(e["signal_path"], e["label_path"], stride=6,
                               cache_dir=str(cache))
            n += 1
    return n


def main():
    for arg in sys.argv[1:]:
        ds = Path(arg)
        t0 = time.time()
        n = prewarm(ds)
        print(f"{ds}: {n} file visits cached in {time.time() - t0:.0f}s",
              flush=True)


if __name__ == "__main__":
    main()
