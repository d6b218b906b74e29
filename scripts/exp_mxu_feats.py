"""Does a [C,16]x[16,S,L] dot_general lower in Mosaic, and does moving
the sphere bilinear terms to the MXU beat VPU broadcasts?"""
import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time, numpy as np, jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

C, K, S, L = 128, 16, 8, 256
REPS = 200

def probe_kernel(a_ref, f_ref, o_ref):
    o_ref[:] = jax.lax.dot_general(
        a_ref[:], f_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)

a = jnp.ones((C, K), jnp.float32)
f = jnp.ones((K, S, L), jnp.float32)
try:
    out = pl.pallas_call(
        probe_kernel,
        out_shape=jax.ShapeDtypeStruct((C, S, L), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(a, f)
    print("probe [C,16]x[16,S,L] LOWERS, sum", float(out.sum()), flush=True)
    ok = True
except Exception as e:
    print("probe FAILED:", str(e)[:300], flush=True)
    ok = False

# VPU-broadcast vs MXU-features: the hb/c_term part of the sphere test
def vpu_kernel(blk_ref, rx_ref, ry_ref, rz_ref, ox_ref, oy_ref, oz_ref, o_ref):
    rx, ry, rz = rx_ref[:], ry_ref[:], rz_ref[:]
    ox, oy, oz = ox_ref[:], oy_ref[:], oz_ref[:]
    acc = jnp.zeros((S, L), jnp.float32)
    def body(i, acc):
        blk = blk_ref[pl.ds(0, C), :]
        def col3(j):
            return blk[:, j:j+1].reshape(-1, 1, 1)
        cx, cy, cz = col3(0), col3(1), col3(2)
        hb = cx * rx + cy * ry + cz * rz
        ct = cx * ox + cy * oy + cz * oz + col3(3)
        disc = hb * hb - ct
        return acc + jnp.min(disc, axis=0)
    o_ref[:] = jax.lax.fori_loop(0, REPS, body, acc)

def mxu_kernel(blk_ref, feats_ref, o_ref):
    acc = jnp.zeros((S, L), jnp.float32)
    def body(i, acc):
        coeff = blk_ref[pl.ds(0, C), :]              # [C,16]: rows 0-2 c, 3 c2r...
        feats = feats_ref[:]                         # [16,S,L]
        both = jax.lax.dot_general(
            coeff, feats, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)      # [C,S,L] = hb (say)
        disc = both * both - both                    # stand-in elementwise tail
        return acc + jnp.min(disc, axis=0)
    o_ref[:] = jax.lax.fori_loop(0, REPS, body, acc)

def timeit(name, f, *args):
    o = f(*args); np.asarray(o.ravel()[0])
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter(); o = f(*args); np.asarray(o.ravel()[0])
        best = min(best, time.perf_counter() - t0)
    print(f"{name}: {(best*1e3-30)/REPS*1000:.1f} us/iter", flush=True)

blk = jnp.asarray(np.random.rand(C, 16), jnp.float32)
rays = [jnp.asarray(np.random.rand(S, L), jnp.float32) for _ in range(6)]
@jax.jit
def run_vpu(blk, *rays):
    return pl.pallas_call(
        vpu_kernel, out_shape=jax.ShapeDtypeStruct((S, L), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 7,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM))(blk, *rays)
feats = jnp.asarray(np.random.rand(16, S, L), jnp.float32)
@jax.jit
def run_mxu(blk, feats):
    return pl.pallas_call(
        mxu_kernel, out_shape=jax.ShapeDtypeStruct((S, L), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM))(blk, feats)

timeit("VPU broadcast hb+ct (2x3 fma + tail)", run_vpu, blk, *rays)
if ok:
    timeit("MXU features (1 dot + tail)", run_mxu, blk, feats)
