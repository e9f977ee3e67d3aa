"""Pure-CPU box calibration: the machine's own parallel ceiling, no Spark.

N independent Python processes each spin a counter for a fixed wall window,
pinned one-per-core with taskset when available. Aggregate increments/sec at
N processes vs the per-process rate at the base level gives the hardware's
achievable scaling efficiency — the ceiling against which any engine
efficiency on this box must be read (hypervisor frequency capping and
hyperthread-pair sharing show up here, not in the engine).

Usage: python tools/box_calibration.py [levels]   (default "2,8,32")
Prints one JSON line: {"rates": {n: incr_per_sec}, "eff_AtoB": ...}.
"""

import json
import os
import shutil
import subprocess
import sys
import time

WINDOW_S = float(os.environ.get("CALIB_WINDOW_S", "6.0"))

_WORKER = r"""
import time, sys
deadline = time.time() + float(sys.argv[1])
n = 0
while time.time() < deadline:
    for _ in range(100000):
        n += 1
print(n)
"""


def measure(procs: int) -> float:
    """Total increments/sec across `procs` pinned processes."""
    have_taskset = shutil.which("taskset") is not None
    children = []
    t0 = time.time()
    for i in range(procs):
        cmd = [sys.executable, "-c", _WORKER, str(WINDOW_S)]
        if have_taskset:
            cmd = ["taskset", "-c", str(i), *cmd]
        children.append(subprocess.Popen(cmd, stdout=subprocess.PIPE, text=True))
    total = 0
    for ch in children:
        out, _ = ch.communicate()
        total += int(out.strip())
    elapsed = time.time() - t0
    return total / elapsed


def main() -> None:
    levels = [int(x) for x in (sys.argv[1] if len(sys.argv) > 1 else "2,8,32").split(",")]
    rates = {n: measure(n) for n in levels}
    effs = {}
    for a, b in zip(levels, levels[1:]):
        # per-process rate ratio == achievable parallel efficiency
        effs[f"eff_{a}to{b}"] = round((rates[b] / b) / (rates[a] / a), 3)
    print(json.dumps({"metric": "box_calibration", "window_s": WINDOW_S,
                      "rates": {str(k): round(v, 1) for k, v in rates.items()},
                      **effs}))


if __name__ == "__main__":
    main()
