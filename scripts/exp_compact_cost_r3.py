"""Round-3: price _compact's internals at the bench shape (2M rays).

Every denser compaction schedule LOSES despite the exact tile-work sim
predicting 1.2-1.6x less intersect work (exp_shade_r3.py: every-bounce
g16 = 3.6M paths/s vs prod 12.1M) — so one compaction costs ~8 ms and
eats the savings. This script times the pieces with an IN-JIT repeat
loop (the tunnel's ~25 ms sync RTT swamps single-shot timings), feeding
each iteration's output into the next so XLA cannot CSE the repeats.
"""
import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time
from functools import partial
import numpy as np, jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

B = 1 << 21  # 2M rays
REPS = 20


def timeit(name, f, *args):
    o = f(*args); jax.block_until_ready(o)
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        o = f(*args)
        jax.block_until_ready(o)
        best = min(best, time.perf_counter() - t0)
    per = (best - 0.0) / REPS
    print(f"{name}: {per*1e3:7.2f} ms/op  (wall {best*1e3:.1f})",
          flush=True)
    return per


rng = np.random.default_rng(0)
state = tuple(jnp.asarray(rng.standard_normal(B).astype(np.float32))
              for _ in range(12))
alive = jnp.asarray((rng.random(B) < 0.1).astype(np.float32))
pixel = jnp.asarray(np.arange(B, dtype=np.int32))

for group in (16, 64):
    g = B // group

    @jax.jit
    def loop_argsort(ag):
        def body(i, carry):
            ag, acc = carry
            perm = jnp.argsort(~ag, stable=True)
            # feed back: rotate the key by the perm so it changes
            return (ag[perm], acc + perm[0])
        return jax.lax.fori_loop(0, REPS, body,
                                 (ag, jnp.int32(0)))[1]

    @partial(jax.jit, static_argnames=("n_words",))
    def loop_pack(st, px, n_words=14):
        def body(i, carry):
            st, px = carry
            ag = (st[-1].reshape(g, group) > 0).any(-1)
            cols = list(st) + [jax.lax.bitcast_convert_type(px,
                                                            jnp.float32)]
            cols += [jnp.zeros_like(st[0])] * (n_words - len(cols))
            perm = jnp.argsort(~ag, stable=True)
            packed = jnp.concatenate([c.reshape(g, group) for c in cols],
                                     axis=1)
            packed = packed[perm]
            parts = [packed[:, j * group:(j + 1) * group].reshape(B)
                     for j in range(len(cols))]
            st = tuple(parts[:13])
            px = jax.lax.bitcast_convert_type(parts[13], jnp.int32)
            return (st, px)
        st, px = jax.lax.fori_loop(0, REPS, body, (st, px))
        return st[0][0] + px[0]

    @jax.jit
    def loop_cumsum_rank(ag):
        def body(i, carry):
            ag, acc = carry
            a = ag.astype(jnp.int32)
            n_live = a.sum()
            c_live = jnp.cumsum(a) - 1
            c_dead = jnp.cumsum(1 - a) - 1
            dest = jnp.where(ag, c_live, n_live + c_dead)  # scatter form
            idx = jnp.arange(g, dtype=jnp.int32)
            perm = jnp.zeros((g,), jnp.int32).at[dest].set(idx)
            return (ag[perm], acc + perm[0])
        return jax.lax.fori_loop(0, REPS, body, (ag, jnp.int32(0)))[1]

    ag0 = (state[-1].reshape(g, group) > 0).any(-1)
    timeit(f"g{group:3d} argsort x{REPS}      ", loop_argsort, ag0)
    timeit(f"g{group:3d} cumsum-rank x{REPS}  ", loop_cumsum_rank, ag0)
    timeit(f"g{group:3d} pack 14w x{REPS}     ",
           partial(loop_pack, n_words=14), state + (alive,), pixel)
    timeit(f"g{group:3d} pack 16w x{REPS}     ",
           partial(loop_pack, n_words=16), state + (alive,), pixel)
