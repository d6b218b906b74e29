"""Is the per-segment fixed cost the (b,)<->(g,8,256) relayouts?"""
import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time, numpy as np, jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
B = 2074624  # bench ray count padded to RAY_TILE
G = B // 2048
REPS = 10

def timeit(name, f, *args):
    o = f(*args); np.asarray(jax.tree_util.tree_leaves(o)[0].ravel()[0])
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        o = f(*args)
        np.asarray(jax.tree_util.tree_leaves(o)[0].ravel()[0])
        best = min(best, time.perf_counter() - t0)
    print(f"{name}: {(best*1e3-30)/REPS:.2f} ms/op", flush=True)

k = jax.random.PRNGKey(0)
flat = [jax.random.normal(jax.random.PRNGKey(i), (B,), jnp.float32)
        for i in range(14)]

@jax.jit
def roundtrip(*arrs):
    def body(i, a):
        # 14 in: flat->lanes; compute; lanes->flat (mimics segment I/O)
        lan = [x.reshape(G, 8, 256) for x in a]
        lan = [x + jnp.float32(i) for x in lan]
        return tuple(x.reshape(B) for x in lan)
    return jax.lax.fori_loop(0, REPS, body, arrs)

@jax.jit
def flat_only(*arrs):
    def body(i, a):
        return tuple(x + jnp.float32(i) for x in a)
    return jax.lax.fori_loop(0, REPS, body, arrs)

S = B // 256
two_d = [jax.random.normal(jax.random.PRNGKey(i), (S, 256), jnp.float32)
         for i in range(14)]

@jax.jit
def twod_only(*arrs):
    def body(i, a):
        return tuple(x + jnp.float32(i) for x in a)
    return jax.lax.fori_loop(0, REPS, body, arrs)

timeit("14x flat->lanes->flat + add", roundtrip, *flat)
timeit("14x flat add only", flat_only, *flat)
timeit("14x [S,256] add only", twod_only, *two_d)
