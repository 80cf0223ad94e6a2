"""Generate the 16-spp CPU parity references (tests/goldens16/).

VERDICT r2 weak #2: the 2-spp parity gate has noise floors of 14-25 dB —
low enough that MC noise can mask a structural break (tower sat 2.6 dB
BELOW its floor and still "passed" via the 3 dB margin). At 16 spp the
seed-to-seed floors rise to ~30 dB, so the TPU-vs-CPU gate in
tools/tpu_parity.py actually detects structural defects.

These are PARITY references (used only by tools/tpu_parity.py on the real
chip), separate from the 2-spp regression goldens the CPU test suite
renders (tests/test_golden.py) — the suite runs on one CPU core and 16 spp
there would multiply its wall time by ~8.

Writes tests/goldens16/<name>.npy (seed 42) and <name>_alt.npy (seed 43).

Run (CPU, ~1-2 h on this 1-core image):
    nice -n 19 python tools/make_parity_refs.py
"""

import os
import sys
import time

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import numpy as np

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tests")

from test_golden import CASES, _render_case  # noqa: E402

OUT_DIR = os.path.join(os.path.dirname(__file__), "..", "tests", "goldens16")
PARITY_SPP = 16


def main() -> int:
    os.makedirs(OUT_DIR, exist_ok=True)
    for name in sorted(CASES):
        model, size, _spp, bounces, denoise = CASES[name]
        for seed, suffix in ((42, ""), (43, "_alt")):
            path = os.path.join(OUT_DIR, f"{name}{suffix}.npy")
            if os.path.exists(path):
                print(f"{name}{suffix}: exists, skipping")
                continue
            t0 = time.time()
            img = _render_case(model, size, PARITY_SPP, bounces, denoise,
                               seed=seed)
            np.save(path, img)
            print(f"{name}{suffix}: {time.time() - t0:.0f}s -> {path}",
                  flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
