"""Sharded BACKWARD passes on the virtual 8-device CPU mesh (VERDICT
r3 #4): the production gradient estimators — path-replay VJP with the
ADJOINT MEGAKERNEL backward, and the in-kernel tape capture +
death-sorted shrinking replay — must produce the single-device
gradients when the pixel batch is sharded over the mesh, whether the
sharding comes from GSPMD propagation (sharded closed-over batch under
plain jit) or an explicit shard_map + psum.

The reference has no gradients at all (its multi-GPU story is
independent farmed processes, gpu-version/blue.py:24-35); this matrix
is the rt_tpu-native combination a multi-chip inverse-rendering user
hits first."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from rt_tpu.config import RenderConfig
from rt_tpu.scene.types import SceneDef, build_tables
from rt_tpu.parallel.mesh import make_mesh, TILE_AXIS, SAMPLE_AXIS


def _scene():
    """Metal sphere + gradient sky keeps the GEOMETRY chain live for
    the tape (reflect direction differentiates through the normal —
    normal through the center — into the direction-dependent sky);
    lambertian + emissive rect cover the radiometric fields."""
    s = SceneDef(width=32, height=16, samples_per_pixel=2, max_depth=4,
                 background=(0.7, 0.8, 1.0))
    s.add_sphere((0, 0, -1.5), 0.5, s.add_metal((0.8, 0.7, 0.6), 0.0))
    s.add_sphere((-1.0, 0, -1.5), 0.5,
                 s.add_lambertian_color((0.7, 0.2, 0.2)))
    s.add_sphere((0, -100.5, -1.5), 100,
                 s.add_lambertian_color((0.5, 0.5, 0.5)))
    s.add_rect("xy_rect", -0.5, 0.5, 0.8, 1.4, -2.5,
               s.add_diffuse_light_color((4.0, 3.5, 3.0)))
    s.set_camera((0, 0.3, 1.2), (0, 0, -1.5), (0, 1, 0), 55, 0.0)
    cfg = RenderConfig(width=32, height=16, samples_per_pixel=2,
                       max_depth=4, loop="while", engine="mega",
                       background_mode="gradient")
    return build_tables(s), cfg


def _batch(cfg):
    n = cfg.width * cfg.height
    pix = np.arange(n, dtype=np.int32)
    return (pix % cfg.width).astype(np.int32), \
        (pix // cfg.width).astype(np.int32), \
        np.full((n, 3), 0.2, np.float32)


def _shard(mesh, *arrays):
    sh = NamedSharding(mesh, P((TILE_AXIS, SAMPLE_AXIS)))
    return tuple(jax.device_put(jnp.asarray(a), sh) for a in arrays)


@pytest.mark.parametrize("bwd_kernel", [False, True])
def test_sharded_replay_grad_matches_single(bwd_kernel):
    """Replay-VJP grads with the pixel batch GSPMD-sharded over the
    full mesh == single-device grads, for both the XLA per-bounce
    backward and the ADJOINT MEGAKERNEL backward."""
    from rt_tpu.diff.replay import make_replay_loss_fn

    tables, cfg = _scene()
    px, py, tgt = _batch(cfg)
    params = {"tex_color": jnp.asarray(tables.tex_color, jnp.float32),
              "mat_albedo": jnp.asarray(tables.mat_albedo, jnp.float32)}

    g_ref = jax.grad(make_replay_loss_fn(
        tables, cfg, 2, px, py, tgt, bwd_kernel=bwd_kernel))(params)
    assert float(np.abs(np.asarray(g_ref["tex_color"])).max()) > 0

    mesh = make_mesh((4, 2), jax.devices())
    pxs, pys, tgts = _shard(mesh, px, py, tgt)
    g_sh = jax.jit(jax.grad(make_replay_loss_fn(
        tables, cfg, 2, pxs, pys, tgts, bwd_kernel=bwd_kernel)))(params)
    for k in params:
        np.testing.assert_allclose(np.asarray(g_sh[k]),
                                   np.asarray(g_ref[k]),
                                   rtol=1e-5, atol=1e-7)


def test_shardmap_adjoint_grads_match():
    """Explicit shard_map flavor: each device runs the megakernel
    forward + adjoint-megakernel backward on its local pixel shard and
    the parameter grads pmean over the mesh — the hand-written SPMD
    equivalent of the GSPMD test above."""
    from functools import partial

    from jax import shard_map

    from rt_tpu.diff.replay import make_replay_loss_fn

    tables, cfg = _scene()
    px, py, tgt = _batch(cfg)
    params = {"tex_color": jnp.asarray(tables.tex_color, jnp.float32)}

    g_ref = jax.grad(make_replay_loss_fn(
        tables, cfg, 2, px, py, tgt, bwd_kernel=True))(params)

    mesh = make_mesh((8, 1), jax.devices())
    pxs, pys, tgts = _shard(mesh, px, py, tgt)
    spec = P((TILE_AXIS, SAMPLE_AXIS))

    @jax.jit
    @partial(shard_map, mesh=mesh, in_specs=(P(), spec, spec, spec),
             out_specs=P(), check_vma=False)
    def gstep(p, lpx, lpy, ltgt):
        lf = make_replay_loss_fn(tables, cfg, 2, lpx, lpy, ltgt,
                                 bwd_kernel=True)
        g = jax.grad(lf)(p)
        # equal shard sizes: global-mean loss grad = mean of shard grads
        return jax.tree_util.tree_map(
            lambda x: jax.lax.pmean(x, (TILE_AXIS, SAMPLE_AXIS)), g)

    g_sh = gstep(params, pxs, pys, tgts)
    np.testing.assert_allclose(np.asarray(g_sh["tex_color"]),
                               np.asarray(g_ref["tex_color"]),
                               rtol=1e-5, atol=1e-6)


def test_sharded_tape_vg_matches_single():
    """The round-3 flagship estimator (in-kernel mega_capture +
    death-sorted shrinking replay) with the pixel batch sharded over
    the mesh: same loss, same grads — including nonzero GEOMETRY
    grads (sph_center through the checker's hit-point dependence)."""
    from rt_tpu.diff.tape import make_tape_vg

    tables, cfg = _scene()
    px, py, tgt = _batch(cfg)
    params = {"tex_color": jnp.asarray(tables.tex_color, jnp.float32),
              "sph_center": jnp.asarray(tables.sph_center, jnp.float32)}

    l1, g1 = make_tape_vg(tables, cfg, px, py, tgt,
                          min_width=128, spp=2)(params)
    assert float(np.abs(np.asarray(g1["sph_center"])).max()) > 0

    mesh = make_mesh((4, 2), jax.devices())
    pxs, pys, tgts = _shard(mesh, px, py, tgt)
    l2, g2 = make_tape_vg(tables, cfg, pxs, pys, tgts,
                          min_width=128, spp=2)(params)
    assert float(l1) == pytest.approx(float(l2), rel=1e-6)
    for k in params:
        np.testing.assert_allclose(np.asarray(g2[k]), np.asarray(g1[k]),
                                   rtol=1e-5, atol=1e-7)


def test_fit_tape_sharded_fast_path():
    """fit(method='tape', mesh=...) rides the fast vg path (inverse.py
    no longer falls back to the slow loss_fn under a mesh) and
    recovers albedo on the 8-device mesh."""
    from rt_tpu.diff.inverse import fit
    from rt_tpu.render.renderer import render

    tables, cfg = _scene()
    target = np.asarray(render(tables, cfg)) / cfg.samples_per_pixel

    # perturb the diffuse hero's albedo (a solid-texture row)
    tex0 = np.array(tables.tex_color, np.float32)
    init = tex0.copy()
    row = 1  # the (-1,0,-1.5) lambertian's solid color
    init[row] = (0.3, 0.5, 0.4)
    mesh = make_mesh((8, 1), jax.devices())
    rec, hist = fit(tables, cfg, target, fields=("tex_color",), spp=2,
                    steps=20, learning_rate=5e-2, mesh=mesh,
                    method="tape",
                    init_params={"tex_color": jnp.asarray(init)})
    assert hist[-1] < hist[0] * 0.5
    assert np.abs(rec["tex_color"][row] - tex0[row]).max() < 0.2


@pytest.mark.parametrize("shape", [(8, 1), (4, 2), (2, 4)])
def test_sharded_replay_grad_mesh_shapes(shape):
    """test_parallel's mesh-shape matrix mirrored onto the gradient
    path (VERDICT r4 #6): adjoint-megakernel replay grads match the
    single-device grads on every (tile, sample) mesh factorization."""
    from rt_tpu.diff.replay import make_replay_loss_fn

    tables, cfg = _scene()
    px, py, tgt = _batch(cfg)
    params = {"tex_color": jnp.asarray(tables.tex_color, jnp.float32)}
    g_ref = jax.grad(make_replay_loss_fn(
        tables, cfg, 2, px, py, tgt, bwd_kernel=True))(params)

    mesh = make_mesh(shape, jax.devices())
    pxs, pys, tgts = _shard(mesh, px, py, tgt)
    g_sh = jax.jit(jax.grad(make_replay_loss_fn(
        tables, cfg, 2, pxs, pys, tgts, bwd_kernel=True)))(params)
    np.testing.assert_allclose(np.asarray(g_sh["tex_color"]),
                               np.asarray(g_ref["tex_color"]),
                               rtol=1e-5, atol=1e-7)


def test_shardmap_queue_forward_grads_match():
    """Queue-engine training step under shard_map (round 5: gradients
    ride the queue engine): each device runs the persistent-queue
    forward + per-bounce replay backward on its pixel shard, grads
    pmean over the mesh — matches the single-device engine='xla'
    gradients (the queue forward is per-lane bit-exact vs XLA)."""
    from functools import partial

    from jax import shard_map

    from rt_tpu.diff.replay import make_replay_loss_fn

    tables, cfg = _scene()
    qcfg = cfg.replace(engine="queue")
    px, py, tgt = _batch(cfg)
    params = {"tex_color": jnp.asarray(tables.tex_color, jnp.float32)}

    g_ref = jax.grad(make_replay_loss_fn(
        tables, cfg.replace(engine="xla"), 2, px, py, tgt))(params)

    mesh = make_mesh((8, 1), jax.devices())
    pxs, pys, tgts = _shard(mesh, px, py, tgt)
    spec = P((TILE_AXIS, SAMPLE_AXIS))

    @jax.jit
    @partial(shard_map, mesh=mesh, in_specs=(P(), spec, spec, spec),
             out_specs=P(), check_vma=False)
    def gstep(p, lpx, lpy, ltgt):
        lf = make_replay_loss_fn(tables, qcfg, 2, lpx, lpy, ltgt)
        g = jax.grad(lf)(p)
        return jax.tree_util.tree_map(
            lambda x: jax.lax.pmean(x, (TILE_AXIS, SAMPLE_AXIS)), g)

    g_sh = gstep(params, pxs, pys, tgts)
    np.testing.assert_allclose(np.asarray(g_sh["tex_color"]),
                               np.asarray(g_ref["tex_color"]),
                               rtol=1e-5, atol=1e-7)


def test_sharded_queue_adjoint_matches_single():
    """Round-5 queue-ADJOINT under GSPMD: replay grads with
    engine='queue' + bwd_kernel=True and the pixel batch sharded over
    the full mesh == the single-device grads (the queue forward AND
    the queue-adjoint backward both ride the sharding)."""
    from rt_tpu.diff.replay import make_replay_loss_fn

    tables, cfg = _scene()
    cfg = cfg.replace(engine="queue")
    px, py, tgt = _batch(cfg)
    params = {"tex_color": jnp.asarray(tables.tex_color, jnp.float32),
              "mat_albedo": jnp.asarray(tables.mat_albedo, jnp.float32)}

    g_ref = jax.grad(make_replay_loss_fn(
        tables, cfg, 2, px, py, tgt, bwd_kernel=True))(params)
    assert float(np.abs(np.asarray(g_ref["tex_color"])).max()) > 0

    mesh = make_mesh((4, 2), jax.devices())
    pxs, pys, tgts = _shard(mesh, px, py, tgt)
    g_sh = jax.jit(jax.grad(make_replay_loss_fn(
        tables, cfg, 2, pxs, pys, tgts, bwd_kernel=True)))(params)
    for k in params:
        np.testing.assert_allclose(np.asarray(g_sh[k]),
                                   np.asarray(g_ref[k]),
                                   rtol=1e-5, atol=1e-7)
