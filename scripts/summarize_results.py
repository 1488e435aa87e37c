"""Summarize results/<round>/parity_*.jsonl into a per-config seed table.

Usage: python scripts/summarize_results.py [results/r4]
Prints, per config: seeds found, final global_step, final/max eval/hypervolume
and eval/eum per seed — the compact view RESULTS_r4.md tables are built from.
"""

from __future__ import annotations

import json
import re
import sys
from collections import defaultdict
from pathlib import Path


def main(root: str = "results/r4") -> None:
    rootp = Path(root)
    rows = defaultdict(dict)
    for f in sorted(rootp.glob("parity_*_seed*.jsonl")):
        m = re.match(r"parity_(.+)_seed(\d+)\.jsonl", f.name)
        if not m:
            continue
        name, seed = m.group(1), int(m.group(2))
        recs = []
        for line in f.read_text().splitlines():
            try:
                recs.append(json.loads(line))
            except json.JSONDecodeError:
                pass
        if not recs:
            rows[name][seed] = dict(empty=True)
            continue
        hv = [r.get("eval/hypervolume") for r in recs if "eval/hypervolume" in r]
        eum = [r.get("eval/eum") for r in recs if "eval/eum" in r]
        rows[name][seed] = dict(
            steps=recs[-1].get("global_step"),
            final_hv=hv[-1] if hv else None,
            max_hv=max(hv) if hv else None,
            final_eum=eum[-1] if eum else None,
            n_evals=len(recs),
        )
    for name in sorted(rows):
        print(f"\n== {name}")
        for seed in sorted(rows[name]):
            r = rows[name][seed]
            if r.get("empty"):
                print(f"  seed {seed}: EMPTY FILE")
                continue
            fh = r["final_hv"]
            mh = r["max_hv"]
            fe = r["final_eum"]
            print(
                f"  seed {seed}: steps={r['steps']} "
                f"final_hv={fh:.3g} max_hv={mh:.3g} final_eum={fe:.3g} ({r['n_evals']} evals)"
                if fh is not None
                else f"  seed {seed}: steps={r['steps']} ({r['n_evals']} evals, no hv)"
            )


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "results/r4")
