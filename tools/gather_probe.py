"""Index-pattern sensitivity of the texel page-row gather (on chip).

The shade census (tools/shade_probe.py) shows one (R,128) u32 row gather
from the 162k-page helmet atlas costs ~4.8 ms/256k rays — a ~19 ns/row
latency chain at 3.5% of HBM bandwidth. Whether that cost is per-ROW-issue
(only reducing row count helps) or per-DISTINCT-row (sorting/dedup helps)
decides the texture-tap attack. Patterns measured:

  rand      : uniform random rows (bounce-ray distribution)
  sorted    : the same rows, sorted (dedup-by-sort candidate)
  rep16     : random per group of 16, repeated 16x (bounce-0 pixel
              coherence: spp=16 samples of a pixel share a page)
  same      : all lanes fetch row 0 (degenerate best case)
  iota      : sequential unique rows (streaming best case)
  rep16s    : rep16 sorted (coherent AND monotonic)
  r16th     : gather only R/16 rows + reshape-broadcast 16x (the
              representative-fetch candidate's tier-0 cost)
  q256/q512 : random row gathers from (N/2, 256) / (N/4, 512) u32 tables —
              the multi-texture SUPER-ROW candidate: if the gather is
              issue-bound per row, a 2 KB row costs the same as a 512 B
              row and ONE gather serves all four material taps
  splt{k}   : one logical gather split into k independent sub-gathers of
              R/k rows (stream-overlap candidate)
  tap4      : four independent (R,128) taps (today's shade ensemble)
  tap4s{k}  : each of the four taps split k ways
  q512s{k}  : the 512-lane quad gather split k ways (quad + overlap)

Methodology per CLAUDE.md: fori_loop inside jit, body depends on the
carry (index perturbed by a carry-derived 0/1), finite carry, np.asarray
fence, best-of-3. All tables AND index vectors are jit ARGUMENTS (a
closed-over device array becomes an HLO constant — stalls tunnel
compiles and bloats cache artifacts).
"""

import time

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

N_ROWS = 161_793  # helmet tpages scale
R = 256 * 1024
ITERS = 16

rng = np.random.default_rng(0)
table = jnp.asarray(rng.integers(0, 2**32, (N_ROWS, 128), np.uint64)
                    .astype(np.uint32))
table2 = table[: (N_ROWS // 2) * 2].reshape(-1, 256)
table4 = table[: (N_ROWS // 4) * 4].reshape(-1, 512)

rand_rows = rng.integers(0, N_ROWS, R).astype(np.int32)
pats = {
    "rand  ": rand_rows,
    "sorted": np.sort(rand_rows),
    "rep16 ": np.repeat(rng.integers(0, N_ROWS, R // 16).astype(np.int32), 16),
    "rep16s": np.repeat(np.sort(rng.integers(0, N_ROWS, R // 16)
                                .astype(np.int32)), 16),
    "same  ": np.zeros(R, np.int32),
    "iota  ": (np.arange(R) % N_ROWS).astype(np.int32),
}


def timed(name, fn, idx, tab):
    """fn(tab, j) with j = idx perturbed by the carry; idx and tab are both
    jit arguments (ADVICE r3: closing over a device index array embeds it
    as an HLO constant)."""
    idx = jnp.asarray(idx)
    n_max = tab.shape[0] - 1

    @jax.jit
    def run(tab, idx):
        def body(_, c):
            # perturb the index by a carry-derived 0/1 so the gather
            # cannot be hoisted; consume the whole fetched block.
            j = jnp.clip(idx + c.astype(jnp.int32), 0, n_max)
            page = fn(tab, j)
            s = (page & jnp.uint32(1)).astype(jnp.float32).sum() * 1e-9
            return jnp.minimum(s, 1.0)

        return jax.lax.fori_loop(0, ITERS, body, jnp.float32(0.0))

    np.asarray(run(tab, idx))  # compile + fence
    best = np.inf
    for _ in range(3):
        t0 = time.perf_counter()
        np.asarray(run(tab, idx))
        best = min(best, (time.perf_counter() - t0) / ITERS)
    print(f"{name}: {best * 1e3:7.3f} ms/256k", flush=True)


print("backend:", jax.default_backend(), flush=True)
for name, idx in pats.items():
    timed(name, lambda t, j: t[j], idx, table)

timed("r16th ", lambda t, j: jnp.broadcast_to(
    t[j[::16]][:, None, :], (R // 16, 16, 128)).reshape(R, 128),
    rand_rows, table)
# super-row candidates: indices drawn in-range for the shrunken tables
# (ADVICE r3: clipping 0..161k rows into a 40k-row table saturated 75% of
# lanes to one row — that measured the degenerate 'same' pattern)
timed("q256  ", lambda t, j: t[j], rand_rows % table2.shape[0], table2)
timed("q512  ", lambda t, j: t[j], rand_rows % table4.shape[0], table4)


# Shade-census fact: four INDEPENDENT taps overlap (8.0 ms vs 7.06 for one)
# — the gather engine runs concurrent streams, it just issues one stream's
# rows serially. So split ONE logical gather into k independent sub-gathers
# of R/k rows: if XLA keeps them separate, the streams overlap ~k-fold.
def make_split(k):
    def f(t, j):
        parts = [t[j[i * (R // k):(i + 1) * (R // k)]] for i in range(k)]
        return jnp.concatenate(parts, axis=0)
    return f


for k in (2, 4, 8, 16):
    timed(f"splt{k:<2d}", make_split(k), rand_rows, table)
for k in (2, 4, 8):
    timed(f"q512s{k}", make_split(k), rand_rows % table4.shape[0], table4)


# shade's real shape: FOUR taps (4 independent index vectors, same table).
# tap4 = today's shade ensemble; tap4s{k} = each tap split k-ways. The four
# index vectors ride one stacked (4, R) jit argument.
idx4_j = jnp.asarray(
    np.stack([rng.integers(0, N_ROWS, R).astype(np.int32) for _ in range(4)])
)


def timed4(name, fn):
    """Like timed() but fn(tab, j, idx4) with the (4, R) index stack as an
    explicit jit argument (ADVICE r3)."""
    @jax.jit
    def run(tab, idx, idx4):
        def body(_, c):
            j = jnp.clip(idx + c.astype(jnp.int32), 0, N_ROWS - 1)
            page = fn(tab, j, idx4)
            s = (page & jnp.uint32(1)).astype(jnp.float32).sum() * 1e-9
            return jnp.minimum(s, 1.0)

        return jax.lax.fori_loop(0, ITERS, body, jnp.float32(0.0))

    np.asarray(run(table, jnp.asarray(rand_rows), idx4_j))
    best = np.inf
    for _ in range(3):
        t0 = time.perf_counter()
        np.asarray(run(table, jnp.asarray(rand_rows), idx4_j))
        best = min(best, (time.perf_counter() - t0) / ITERS)
    print(f"{name}: {best * 1e3:7.3f} ms/256k", flush=True)


def tap4(t, j, idx4):
    acc = jnp.zeros((R, 128), jnp.uint32)
    for i in range(4):
        acc = acc ^ t[jnp.clip(idx4[i] + (j[:1] & 1), 0, N_ROWS - 1)]
    return acc


def tap4s(k):
    def f(t, j, idx4):
        acc = jnp.zeros((R, 128), jnp.uint32)
        for i in range(4):
            parts = [
                t[jnp.clip(idx4[i][c * (R // k):(c + 1) * (R // k)]
                           + (j[:1] & 1), 0, N_ROWS - 1)]
                for c in range(k)
            ]
            acc = acc ^ jnp.concatenate(parts, axis=0)
        return acc
    return f


timed4("tap4  ", tap4)
timed4("tap4s2", tap4s(2))
timed4("tap4s4", tap4s(4))
