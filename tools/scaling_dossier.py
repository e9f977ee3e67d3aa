"""Fold multiple `bench.py --scaling` session JSONs into one evidence table.

The north rule's 8->32 leg cannot be settled by one wall-clock reading on
this box (identical code swings up to 3.6x at 32 threads, VERDICT r5), so
round 6's evidence is a DOSSIER: several interleaved sessions spread across
hours, each reporting raw efficiency, box-normalized efficiency, AND the
work-invariance ratios (summed task CPU / shuffle bytes / task count at the
two levels — flat ratios prove the plan does no extra work at higher
parallelism, so any wall gap is the box).

Usage: python tools/scaling_dossier.py [bench_runs/scaling_r06_s*.json ...]
Prints a markdown table + a one-line JSON verdict (best raw per leg, median
raw, work-invariance spread) for BENCH.md §8c.
"""

from __future__ import annotations

import glob
import json
import statistics
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def main() -> int:
    paths = sys.argv[1:] or sorted(glob.glob(str(REPO / "bench_runs" / "scaling_r06_s*.json")))
    if not paths:
        print("no session files found", file=sys.stderr)
        return 1
    rows = []
    for p in paths:
        d = json.loads(Path(p).read_text())
        for key, leg in d.get("legs", {}).items():
            wi = leg.get("work_invariance", {})
            rows.append(
                {
                    "session": Path(p).stem,
                    "leg": key,
                    "raw_eff": leg.get("raw_eff"),
                    "norm_eff": leg.get("norm_eff"),
                    "box_ceiling": leg.get("box_ceiling"),
                    "sec": leg.get("sec"),
                    "visits": leg.get("visits"),
                    "parity": leg.get("parity"),
                    "wi_cpu": wi.get("cpu_s"),
                    "wi_shuffle": wi.get("shuffle_write_mb"),
                    "wi_tasks": wi.get("n_tasks"),
                }
            )

    print("| session | leg | raw eff | box ceiling | norm eff | work ratio cpu / shuffle / tasks | parity |")
    print("|---|---|---|---|---|---|---|")
    for r in rows:
        print(
            f"| {r['session']} | {r['leg']} | {r['raw_eff']} | {r['box_ceiling']} "
            f"| {r['norm_eff']} | {r['wi_cpu']} / {r['wi_shuffle']} / {r['wi_tasks']} "
            f"| {'yes' if r['parity'] else 'NO'} |"
        )

    verdict: dict = {}
    for leg_key in sorted({r["leg"] for r in rows}):
        legs = [r for r in rows if r["leg"] == leg_key]
        raws = [r["raw_eff"] for r in legs if r["raw_eff"] is not None]
        norms = [r["norm_eff"] for r in legs if r["norm_eff"] is not None]
        wis = [r["wi_cpu"] for r in legs if r["wi_cpu"] is not None]
        verdict[leg_key] = {
            "sessions": len(legs),
            "best_raw": max(raws) if raws else None,
            "median_raw": round(statistics.median(raws), 3) if raws else None,
            "best_norm": max(norms) if norms else None,
            "work_cpu_ratio_range": [min(wis), max(wis)] if wis else None,
            "parity_all": all(r["parity"] for r in legs),
        }
    print()
    print(json.dumps({"metric": "scaling_dossier", "legs": verdict}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
