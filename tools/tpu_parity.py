"""TPU-vs-CPU quality parity: render the five BASELINE configs on the real
chip (Pallas traversal path) and PSNR them against the checked-in CPU
goldens (tests/goldens/*.npy, XLA top-k path).

BASELINE.md quality gate: "PSNR >= CPU reference on golden scenes". The two
backends share seeds and algorithms; differences come from backend math
scheduling (and the traversal implementation), so parity here validates the
Pallas kernel end-to-end on hardware.

Writes PSNR_r02.json and prints a table (recorded in docs/PERF.md).

Run: PYTHONPATH=/root/repo:/root/.axon_site python tools/tpu_parity.py
"""

import json
import os
import sys

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))
from test_golden import CASES, GOLDEN_DIR, _render_case, psnr  # noqa: E402

THRESH_DB = 30.0  # MC noise at 2 spp dominates; structural breaks sit far below


def main() -> int:
    print("backend:", jax.default_backend())
    results = {}
    for name in sorted(CASES):
        golden_path = os.path.join(GOLDEN_DIR, f"{name}.npy")
        if not os.path.exists(golden_path):
            print(f"{name}: NO GOLDEN (run pytest tests/test_golden.py)")
            continue
        img = _render_case(*CASES[name])
        p = psnr(img, np.load(golden_path))
        results[name] = round(float(p), 2)
        status = "ok" if p >= THRESH_DB else "FAIL"
        print(f"{name:10s} PSNR vs CPU golden: {p:6.2f} dB  [{status}]")

    out = {
        "metric": "TPU-vs-CPU PSNR (dB) on BASELINE configs",
        "backend": jax.default_backend(),
        "threshold_db": THRESH_DB,
        "psnr": results,
        "pass": bool(results) and all(v >= THRESH_DB for v in results.values()),
    }
    path = os.path.join(os.path.dirname(__file__), "..", "PSNR_r02.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))
    return 0 if out["pass"] else 1


if __name__ == "__main__":
    raise SystemExit(main())
