"""Is the XLA TPU row-gather locality-sensitive at all? Times take(x, idx)
for sequential, block-local (post-reorder best case) and uniform-random
index vectors of the same length. If the three agree, gather cost is
per-row bound and node reordering cannot help the fused step."""
import sys, time
import numpy as np
import jax
import jax.numpy as jnp

N, E, D = 169_984, 1_166_336, 64
rng = np.random.default_rng(0)
x = jax.random.normal(jax.random.key(0), (N, D), jnp.bfloat16)

idx_seq = jnp.asarray(np.arange(E) % N, jnp.int32)
idx_blk = jnp.asarray((np.arange(E) // 8 * 8 + rng.integers(0, 8, E)) % N,
                      jnp.int32)  # 8-row locality
idx_rnd = jnp.asarray(rng.integers(0, N, E), jnp.int32)
# power-law (matches arxiv-scale receiver skew)
idx_pow = jnp.asarray(np.floor(N * rng.random(E) ** 2.0).astype(np.int32))


def timeit(fn, args, iters=8, warmup=2):
    outs = None
    for i in range(warmup):
        outs = fn(*[a * (1 + 1e-6 * i) if a.dtype != jnp.int32 else a
                    for a in args])
    jax.block_until_ready(outs)
    float(jnp.asarray(jax.tree_util.tree_leaves(outs)[0]).reshape(-1)[0])
    t0 = time.perf_counter()
    res = []
    for i in range(iters):
        res.append(fn(*[a * (1 + 1e-6 * (i + 7)) if a.dtype != jnp.int32
                        else a for a in args]))
    float(jnp.asarray(jax.tree_util.tree_leaves(res[-1])[0]).reshape(-1)[0])
    jax.block_until_ready(res)
    return (time.perf_counter() - t0) / iters


which = sys.argv[1]
idx = {"seq": idx_seq, "blk": idx_blk, "rnd": idx_rnd, "pow": idx_pow}[which]
f = jax.jit(lambda x: jnp.take(x, idx, axis=0))
print(f"gather_{which}_ms", round(timeit(f, (x,)) * 1e3, 2))
