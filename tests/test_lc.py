import jax.numpy as jnp
import numpy as np
import pytest

from vec_ode_tpu import lc


def tree():
    return {
        "a": jnp.arange(6, dtype=jnp.float64).reshape(2, 3),
        "b": (jnp.ones(4, dtype=jnp.float64), jnp.asarray(2.0)),
    }


def test_scale_add_sub_axpy():
    v = tree()
    w = lc.scale(v, 2.0)
    np.testing.assert_allclose(w["a"], 2 * np.arange(6).reshape(2, 3))
    s = lc.add(v, v)
    np.testing.assert_allclose(s["b"][0], 2 * np.ones(4))
    d = lc.sub(s, v)
    np.testing.assert_allclose(d["a"], v["a"])
    ax = lc.axpy(3.0, v, v)
    np.testing.assert_allclose(ax["b"][1], 8.0)


def test_lincomb_matches_manual():
    v1, v2, v3 = tree(), lc.scale(tree(), -1.0), lc.scale(tree(), 0.5)
    out = lc.lincomb([v1, v2, v3], [2.0, 3.0, -4.0])
    expect = 2.0 - 3.0 - 2.0
    np.testing.assert_allclose(out["b"][0], expect * np.ones(4))


def test_lincomb_validation():
    with pytest.raises(ValueError):
        lc.lincomb([], [])
    with pytest.raises(ValueError):
        lc.lincomb([tree()], [1.0, 2.0])


def test_norms():
    v = {"r": jnp.asarray([3.0, 4.0])}
    np.testing.assert_allclose(lc.norm_l2(v), 5.0)
    np.testing.assert_allclose(lc.norm_max(v), 4.0)
    np.testing.assert_allclose(lc.norm_rms(v), 5.0 / np.sqrt(2))


def test_norm_complex():
    v = jnp.asarray([3.0 + 4.0j])
    np.testing.assert_allclose(lc.norm_l2(v), 5.0)
    assert not jnp.iscomplexobj(lc.norm_l2(v))


def test_scalar_dtype_no_promotion():
    # f64 traced scalar must not promote an f32 leaf
    k = jnp.asarray(2.0, dtype=jnp.float64)
    v = jnp.ones(3, dtype=jnp.float32)
    assert lc.scale(v, k).dtype == jnp.float32
    assert lc.axpy(k, v, v).dtype == jnp.float32
    # real scalar on complex leaf stays complex64
    c = jnp.ones(3, dtype=jnp.complex64)
    assert lc.scale(c, k).dtype == jnp.complex64


def test_tree_where():
    a, b = tree(), lc.scale(tree(), -1.0)
    out = lc.tree_where(jnp.asarray(True), a, b)
    np.testing.assert_allclose(out["a"], a["a"])
    out = lc.tree_where(jnp.asarray(False), a, b)
    np.testing.assert_allclose(out["a"], -a["a"])


def test_tree_where_batched_mask():
    a = jnp.ones((4, 3))
    b = jnp.zeros((4, 3))
    mask = jnp.asarray([True, False, True, False])
    out = lc.tree_where(mask, a, b)
    np.testing.assert_allclose(out[:, 0], [1, 0, 1, 0])


def test_vdot():
    u = jnp.asarray([1.0 + 1.0j, 2.0])
    np.testing.assert_allclose(lc.vdot(u, u), 6.0)


def test_quad_gl_nodes_match_tableau_constants():
    """The GL node tables in quad.py and tableaus.py are two transcriptions
    of the same spec constants; pin them to each other against drift."""
    import numpy as np

    from vec_ode_tpu import quad, tableaus as tb

    np.testing.assert_allclose(quad._GL_01[2][0], tb.C_GAUSS_LEGENDRE_4,
                               rtol=0, atol=1e-15)
    np.testing.assert_allclose(quad._GL_01[3][0], tb.C_GAUSS_LEGENDRE_6,
                               rtol=0, atol=1e-15)
