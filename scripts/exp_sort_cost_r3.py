import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time
import numpy as np, jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

B = 2 * 1024 * 1024
REPS = 8

def timeit(name, f, *args):
    o = f(*args); np.asarray(jax.tree_util.tree_leaves(o)[0].ravel()[0])
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        o = f(*args); np.asarray(jax.tree_util.tree_leaves(o)[0].ravel()[0])
        best = min(best, time.perf_counter() - t0)
    print(f"{name}: {(best)/REPS*1e3:7.2f} ms/op (wall {best*1e3:.0f})", flush=True)

rng = np.random.default_rng(0)
keys = jnp.asarray(rng.integers(0, 5, B).astype(np.int32))
vals = jnp.asarray(np.arange(B, dtype=np.int32))
r3 = jnp.asarray(rng.standard_normal((B, 3)).astype(np.float32))
perm_np = rng.permutation(B).astype(np.int32)
perm = jnp.asarray(perm_np)

@jax.jit
def loop_sort(keys, vals):
    def body(i, kv):
        k, v = kv
        k2, v2 = jax.lax.sort_key_val(k, v, is_stable=True)
        return (k2 ^ (v2 & 7), v2)   # mutate key so no CSE
    return jax.lax.fori_loop(0, REPS, body, (keys, vals))

@jax.jit
def loop_sort_unstable(keys, vals):
    def body(i, kv):
        k, v = kv
        k2, v2 = jax.lax.sort_key_val(k, v, is_stable=False)
        return (k2 ^ (v2 & 7), v2)
    return jax.lax.fori_loop(0, REPS, body, (keys, vals))

@jax.jit
def loop_take_rows(r3, perm):
    def body(i, rp):
        r, p = rp
        r2 = jnp.take(r, p, axis=0)
        return (r2, (p + 1) % B)
    return jax.lax.fori_loop(0, REPS, body, (r3, perm))

@jax.jit
def loop_take_flat(v, perm):
    def body(i, vp):
        x, p = vp
        x2 = jnp.take(x, p)
        return (x2, (p + 1) % B)
    return jax.lax.fori_loop(0, REPS, body, (v, perm))

timeit("sort_key_val 2M stable  ", loop_sort, keys, vals)
timeit("sort_key_val 2M unstable", loop_sort_unstable, keys, vals)
timeit("take [2M,3] rows        ", loop_take_rows, r3, perm)
timeit("take [2M] flat          ", loop_take_flat, vals.astype(jnp.float32), perm)
