"""On-chip A/B of per-bounce RNG draw variants (serialized-in-jit).

a) current   : vmap(s -> uniform(fold_in(fold_in(key, s), i), (4,)))
b) swapped   : kb = fold_in(key, i); vmap(s -> uniform(fold_in(kb, s), (4,)))
c) threefry  : hand-rolled threefry2x32, counter=(slot, chanpair), key
               folded with bounce once (scalar) — 2 hashes/lane.

Methodology per CLAUDE.md: amortize inside jit with fori_loop; the body
must depend on the carry and the carry must stay finite; fence with
np.asarray.
"""
import time
import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

R = 1 << 20
TRIPS = 64
key = jax.random.PRNGKey(7)
slots = jnp.arange(R, dtype=jnp.int32)


def variant_a(i, slot):
    def draw(s):
        k = jax.random.fold_in(jax.random.fold_in(key, s), i)
        return jax.random.uniform(k, (4,), jnp.float32)
    return jax.vmap(draw, out_axes=1)(slot)


def variant_b(i, slot):
    kb = jax.random.fold_in(key, i)
    def draw(s):
        return jax.random.uniform(jax.random.fold_in(kb, s), (4,), jnp.float32)
    return jax.vmap(draw, out_axes=1)(slot)


# ---- hand-rolled threefry2x32 (public Threefry-2x32, 20 rounds) ----
ROT = (13, 15, 26, 6, 17, 29, 16, 24)


def _tf2x32(k0, k1, x0, x1):
    """Threefry-2x32, 20 rounds, vector counter (x0, x1) u32."""
    ks2 = k0 ^ k1 ^ np.uint32(0x1BD11BDA)
    ks = (k0, k1, ks2)
    x0 = x0 + k0
    x1 = x1 + k1
    for r in range(5):
        for j in range(4):
            rot = ROT[(r * 4 + j) % 8]
            x0 = x0 + x1
            x1 = (x1 << rot) | (x1 >> (32 - rot))
            x1 = x1 ^ x0
        s = r + 1
        x0 = x0 + ks[s % 3]
        x1 = x1 + ks[(s + 1) % 3] + np.uint32(s)
    return x0, x1


def variant_c(i, slot):
    kd = jax.random.key_data(key)
    k0, k1 = kd[0], kd[1]
    # fold the bounce into the key: one scalar hash
    b0, b1 = _tf2x32(k0, k1, jnp.uint32(i), jnp.uint32(0x9E3779B9))
    s = slot.astype(jnp.uint32)
    u0, u1 = _tf2x32(b0, b1, s, jnp.zeros_like(s))
    u2, u3 = _tf2x32(b0, b1, s, jnp.ones_like(s))
    def f01(u):
        return (u >> np.uint32(9)).astype(jnp.float32) * np.float32(1 / (1 << 23))
    return jnp.stack([f01(u0), f01(u1), f01(u2), f01(u3)])


def bench(fn, name):
    @jax.jit
    def run(slot):
        def body(i, carry):
            u = fn(i, slot)
            # consume the FULL array; keep the carry finite
            return jnp.minimum(carry + u.sum() * 1e-9, 1.0)
        return jax.lax.fori_loop(0, TRIPS, body, jnp.float32(0.0))

    r = np.asarray(run(slots))  # compile + fence
    t0 = time.perf_counter()
    r = np.asarray(run(slots))
    dt = time.perf_counter() - t0
    print(f"{name}: {dt / TRIPS * 1e3:.3f} ms/draw @ {R} lanes  (r={r})",
          flush=True)


# sanity: variant c produces uniforms in [0,1) and differs per slot/bounce
u = np.asarray(variant_c(jnp.int32(3), slots[:1024]))
assert u.shape == (4, 1024) and (u >= 0).all() and (u < 1).all()
assert len(np.unique(u[0])) > 1000, "degenerate stream"
ub = np.asarray(variant_c(jnp.int32(4), slots[:1024]))
assert not np.array_equal(u, ub)
print("variant_c sanity ok; mean", u.mean(), flush=True)

print("backend:", jax.default_backend(), flush=True)
bench(variant_a, "a_current ")
bench(variant_b, "b_swapped ")
bench(variant_c, "c_threefry")
bench(variant_a, "a_again   ")
