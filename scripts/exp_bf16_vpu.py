"""Does bf16 double VPU elementwise throughput on v5e?

bf16's native tile is (16,128) = 2x elements per vreg vs f32 (8,128),
so a pure-VPU fma chain *could* run 2x elements/cycle. If true, a bf16
candidate intersect pass (+ f32 winner refine from the extracted
attrs) is the next megakernel lever; if false, drop the idea.
"""
import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time, functools, numpy as np, jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

REPS = 512  # fma-chain length inside the kernel


def _kern(x_ref, o_ref, *, op):
    x = x_ref[...]
    a = x * np.float32(1.000001).astype(x.dtype) if x.dtype != jnp.float32 \
        else x * np.float32(1.000001)

    def body(i, y):
        if op == "fma":
            return y * jnp.asarray(0.9999, y.dtype) + a
        if op == "sqrt":
            return jnp.sqrt(y * y + a * a)
        if op == "cmpsel":
            return jnp.where(y > a, y * jnp.asarray(0.9999, y.dtype), a)
        raise ValueError(op)

    o_ref[...] = jax.lax.fori_loop(0, REPS, body, x)


def run(dtype, shape, op):
    x = jnp.ones(shape, dtype)
    f = pl.pallas_call(
        functools.partial(_kern, op=op),
        out_shape=jax.ShapeDtypeStruct(shape, dtype),
    )
    jf = jax.jit(f)
    o = jf(x); np.asarray(o.ravel()[0])
    best = 1e9
    for _ in range(4):
        t0 = time.perf_counter()
        o = jf(x)
        np.asarray(o.ravel()[0])
        best = min(best, time.perf_counter() - t0)
    n = np.prod(shape) * REPS
    print(f"{op:6s} {str(dtype):10s} {shape}: {best*1e3:7.2f} ms "
          f"-> {n/best/1e12:6.2f} Telem-ops/s", flush=True)


for op in ("fma", "sqrt", "cmpsel"):
    run(jnp.float32, (2048, 256), op)
    run(jnp.bfloat16, (2048, 256), op)
