"""Narrow down the pathological op inside topk."""

import time

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

R = 65536
print("backend:", jax.default_backend())
key = jax.random.PRNGKey(0)


def bench(name, fn, *args):
    f = jax.jit(fn)
    out = jax.block_until_ready(f(*args))
    t0 = time.perf_counter()
    for _ in range(5):
        out = f(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / 5
    print(f"{name}: {dt*1e3:.2f} ms")
    return dt


d = jax.random.normal(key, (64, R), jnp.float32)
order = jnp.argsort(d, axis=0).astype(jnp.int32)

bench("take_along_axis (64,R) axis0 full",
      lambda x, o: jnp.take_along_axis(x, o, axis=0).sum(), d, order)
bench("take_along_axis (64,R) axis0 top8",
      lambda x, o: jnp.take_along_axis(x, o[:8], axis=0).sum(), d, order)

j = jax.random.randint(key, (R,), 0, 64, jnp.int32)
rr = jnp.arange(R)
bench("fancy x[j, rr] from (64,R)", lambda x, jj: x[jj, rr].sum(), d, j)
bench("one-hot reduce instead of x[j,rr]",
      lambda x, jj: (x * (jnp.arange(64, dtype=jnp.int32)[:, None] == jj[None, :])).sum(0).sum(),
      d, j)

# sorted-value alternative: sort values directly (no index gather)
bench("sort values (64,R)", lambda x: jnp.sort(x, axis=0)[:8].sum(), d)

# argsort + gather of int ids
ids = jax.random.randint(key, (64, R), 0, 4096, jnp.int32)
bench("take_along_axis ids top8",
      lambda x, o: jnp.take_along_axis(x, o[:8], axis=0).sum(), ids, order)

# combined: the exact pattern used per level
def level_pattern(cand_d, cand_ids):
    o = jnp.argsort(cand_d, axis=0).astype(jnp.int32)
    sd = jnp.take_along_axis(cand_d, o, axis=0)
    ids = jnp.take_along_axis(cand_ids, o[:8], axis=0)
    return sd[:8].sum() + ids.sum()

bench("level pattern (argsort+2x take)", level_pattern, d, ids)

# lax.top_k comparison (note: top_k gives LARGEST; use negated)
bench("lax.top_k k=8 on -(64,R) transposed",
      lambda x: jax.lax.top_k(-x.T, 8)[0].sum(), d)
