"""Package the engine for `spark-submit --py-files`.

Writes `dist/accelerating_tc_spark.zip` containing the package's .py
files (stdlib zipfile only — no build backend needed in the sandbox).
Executors unpack this onto their PYTHONPATH, which is how the engine
ships to a multi-executor cluster per the north rule; `tools/submit_job.py`
is the matching driver script.

Usage: python tools/make_pyfiles.py [out_dir]
"""

from __future__ import annotations

import sys
import zipfile
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def build(out_dir: Path | str = REPO / "dist") -> Path:
    out_dir = Path(out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    out = out_dir / "accelerating_tc_spark.zip"
    pkg = REPO / "accelerating_tc_spark"
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as z:
        for py in sorted(pkg.rglob("*.py")):
            z.write(py, py.relative_to(REPO))
    return out


if __name__ == "__main__":
    dest = build(sys.argv[1]) if len(sys.argv) > 1 else build()
    print(dest)
