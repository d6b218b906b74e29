"""Round-5 queue-tail harvest (VERDICT r4 #5a): the assembly sort.

The queue engine's frame assembly restores lane order from completion
records with ONE 4-operand slot-keyed lax.sort — 0.19 s of the 1.179 s
bench frame (16%). Alternatives timed here at the bench scale
(1 << 25 records):

  a) 4-op sort (key, r, g, b)          — current production path
  b) 2-op sort (key, idx) + 3 gathers  — less data moved through the
     sorting network; gathers are HBM-bandwidth if XLA vectorizes
  c) 1-op argsort(key) + 4 gathers
  d) scatter rgb.at[key].set(...) with unique_indices hint — every
     slot completes exactly once, so the scatter is a permutation
     (the .at[pix].add scatter-ADD measured 2.75 s in round 4; set
     with unique indices may lower differently)

Usage: python scripts/exp_sort_alt_r5.py [log2_n]
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    log2n = int(sys.argv[1]) if len(sys.argv) > 1 else 25
    n = 1 << log2n
    rs = np.random.RandomState(0)
    perm = rs.permutation(n).astype(np.int32)
    key = jnp.asarray(perm)
    r = jnp.asarray(rs.rand(n).astype(np.float32))
    g = jnp.asarray(rs.rand(n).astype(np.float32))
    b = jnp.asarray(rs.rand(n).astype(np.float32))

    @jax.jit
    def sort4(key, r, g, b):
        _, rs_, gs_, bs_ = jax.lax.sort((key, r, g, b), num_keys=1)
        return rs_, gs_, bs_

    @jax.jit
    def sort2_gather(key, r, g, b):
        idx = jax.lax.broadcasted_iota(jnp.int32, (key.shape[0],), 0)
        _, perm = jax.lax.sort((key, idx), num_keys=1)
        return jnp.take(r, perm), jnp.take(g, perm), jnp.take(b, perm)

    @jax.jit
    def argsort_gather(key, r, g, b):
        perm = jnp.argsort(key)
        return jnp.take(r, perm), jnp.take(g, perm), jnp.take(b, perm)

    @jax.jit
    def scatter_set(key, r, g, b):
        z = jnp.zeros_like(r)
        return (z.at[key].set(r, unique_indices=True,
                              indices_are_sorted=False),
                z.at[key].set(g, unique_indices=True),
                z.at[key].set(b, unique_indices=True))

    want = np.empty(n, np.float32)
    want[perm] = np.asarray(r)

    out = {}
    for name, fn in [("sort4", sort4), ("sort2_gather", sort2_gather),
                     ("argsort_gather", argsort_gather),
                     ("scatter_set", scatter_set)]:
        res = jax.block_until_ready(fn(key, r, g, b))
        np.testing.assert_allclose(np.asarray(res[0])[:1024], want[:1024])
        ts = []
        for _ in range(5):
            t0 = time.perf_counter()
            jax.block_until_ready(fn(key, r, g, b))
            ts.append(time.perf_counter() - t0)
        out[name] = round(min(ts) * 1e3, 1)
        print(f"{name:16s} {out[name]:8.1f} ms", flush=True)
    print(json.dumps({"n": n, "best_ms": out}))


if __name__ == "__main__":
    main()
