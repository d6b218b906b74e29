import numpy as np
import jax.numpy as jnp

from rt_tpu.ops import geometry as geom


def test_rotate_inverse_is_transpose():
    m, minv = geom.rotate((0, 1, 0), np.pi / 3)
    np.testing.assert_allclose(m.T, minv, atol=1e-6)
    np.testing.assert_allclose(m @ minv, np.eye(4), atol=1e-6)


def test_translate_compose_apply():
    t = geom.compose(geom.translate((1, 2, 3)), geom.rotate((0, 0, 1), np.pi / 2))
    p = np.array([1.0, 0.0, 0.0], np.float32)
    # rotate about z by 90deg: (1,0,0)->(0,1,0); then translate
    out = geom.apply_point(np, t[0], p)
    np.testing.assert_allclose(out, [1, 3, 3], atol=1e-6)
    back = geom.apply_point(np, t[1], out)
    np.testing.assert_allclose(back, p, atol=1e-6)


def test_apply_vec_ignores_translation():
    t = geom.translate((5, 5, 5))
    v = np.array([1.0, 2.0, 3.0], np.float32)
    np.testing.assert_allclose(geom.apply_vec(np, t[0], v), v)


def test_apply_normal_rigid_motion():
    m, minv = geom.compose(geom.translate((1, 0, 0)), geom.rotate((1, 0, 0), 0.7))
    n = np.array([0.0, 1.0, 0.0], np.float32)
    out = geom.apply_normal(np, minv, n)
    expected = geom.apply_vec(np, m, n)  # rigid: normal == rotated vector
    np.testing.assert_allclose(out, expected, atol=1e-6)
    np.testing.assert_allclose(np.linalg.norm(out), 1.0, atol=1e-6)


def test_reflect():
    v = np.array([[1.0, -1.0, 0.0]], np.float32)
    n = np.array([[0.0, 1.0, 0.0]], np.float32)
    np.testing.assert_allclose(geom.reflect(np, v, n), [[1, 1, 0]], atol=1e-7)


def test_refract_snell():
    # normal incidence: direction unchanged
    uv = np.array([[0.0, -1.0, 0.0]], np.float32)
    n = np.array([[0.0, 1.0, 0.0]], np.float32)
    out = geom.refract(np, uv, n, np.array([0.5], np.float32))
    np.testing.assert_allclose(out, [[0, -1, 0]], atol=1e-6)
    # 45 degrees into glass (eta ratio 1/1.5): check Snell's law
    uv = np.array([[np.sin(np.pi / 4), -np.cos(np.pi / 4), 0.0]], np.float32)
    out = geom.refract(np, uv, n, np.array([1 / 1.5], np.float32))
    sin_out = out[0, 0] / np.linalg.norm(out[0])
    np.testing.assert_allclose(sin_out, np.sin(np.pi / 4) / 1.5, atol=1e-6)


def test_jnp_numpy_agree():
    m, minv = geom.rotate((1, 2, 3), 0.9)
    p = np.random.RandomState(0).randn(16, 3).astype(np.float32)
    a = geom.apply_point(np, m, p)
    b = np.asarray(geom.apply_point(jnp, jnp.asarray(m), jnp.asarray(p)))
    np.testing.assert_allclose(a, b, rtol=1e-6)
