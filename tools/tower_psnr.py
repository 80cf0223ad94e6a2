"""Why is tower's TPU-vs-CPU parity PSNR (34.5 dB, PSNR_r04) half
helmet's (63.8), when both paths are oracle-exact? (VERDICT r4 weak #4.)

Hypothesis: the gap is the Moller-Trumbore CONDITIONING class, not a
numerics bug — tower's architectural mesh is full of sliver triangles
and rail edges where |det| is tiny relative to its operands, so any two
schedulings of the same exact f32 math (CPU XLA vs TPU Mosaic, or
topk vs pallas) legitimately pick different-but-equally-valid hits, and
tower's high-contrast env lighting amplifies each flipped hit into a
large pixel delta.

Instrument: render each scene twice on the CPU with two EXACT verified
methods (topk vs pallas_fused) at the parity-gate config. Both land on
the brute-force oracle up to conditioning, so the PSNR between them IS
the conditioning-noise floor of the scene's geometry+lighting — no
hardware involved. If tower's method-vs-method PSNR sits near its 34.5
TPU-parity figure while helmet's sits near its 63.8, the margin is the
geometry's conditioning, not a TPU numerics class.

Run (CPU): python tools/tower_psnr.py
"""

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np

from raytracing_c_tpu.io.loader import load_scene
from raytracing_c_tpu.render import renderer

CFGS = [
    ("tower", "/root/reference/models/tower.obj"),
    ("helmet", "/root/reference/models/helmet.glb"),
]


def psnr(a, b):
    mse = np.mean((np.asarray(a, np.float64) - np.asarray(b, np.float64)) ** 2)
    if mse == 0:
        return float("inf")
    return 10.0 * np.log10(1.0 / mse)


for name, path in CFGS:
    scene = load_scene(path, background_path=None, warn=lambda *a: None)
    imgs = {}
    for method in ("pallas_fused", "topk"):
        img, _ = renderer.render(
            scene, 128, 128, spp=16, max_bounces=8, seed=42, method=method
        )
        imgs[method] = np.clip(np.asarray(img), 0.0, 1.0)
    p = psnr(imgs["pallas_fused"], imgs["topk"])
    d = np.abs(imgs["pallas_fused"] - imgs["topk"])
    frac = (d.max(axis=-1) > 1e-3).mean()
    print(
        f"{name}: exact-vs-exact PSNR {p:.2f} dB | "
        f"pixels differing >1e-3: {frac*100:.3f}% | max delta {d.max():.3f}",
        flush=True,
    )
