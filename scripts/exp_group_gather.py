import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time, numpy as np, jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
B = 1 << 21
NCOL = 16
REPS = 20

def timeit(name, f, *args):
    o = f(*args); np.asarray(jax.tree_util.tree_leaves(o)[0].ravel()[0])
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        o = f(*args)
        np.asarray(jax.tree_util.tree_leaves(o)[0].ravel()[0])
        best = min(best, time.perf_counter() - t0)
    print(f"{name}: {(best*1e3 - 30)/REPS:.2f} ms/op (wall {best*1e3:.0f} ms)")

k = jax.random.PRNGKey(0)
st = jax.random.normal(k, (B, NCOL), jnp.float32)
alive = jax.random.uniform(k, (B,)) > 0.9

def make(group):
    @jax.jit
    def f(alive, st):
        def body(i, carry):
            st_, al = carry
            g = B // group
            a2 = al.reshape(g, group).any(-1)
            perm = jnp.argsort(a2 ^ True, stable=True)
            st_ = st_.reshape(g, group * NCOL)[perm].reshape(B, NCOL)
            # dependency chain: derive next alive from data
            al = (st_[:, 0] + jnp.float32(i)) > 1.2
            return st_, al
        st2, _ = jax.lax.fori_loop(0, REPS, body, (st, alive))
        return st2
    return f

@jax.jit
def sort_only(alive):
    def body(i, acc):
        p = jnp.argsort((alive ^ (acc % 2 == 0)), stable=True)
        return acc + p[0]
    return jax.lax.fori_loop(0, REPS, body, jnp.int32(0))

timeit("argsort 2M only", sort_only, alive)
for group in (8, 32, 128, 2048):
    timeit(f"group={group}", make(group), alive, st)
