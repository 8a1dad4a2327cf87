import jax
import jax.numpy as jnp
import numpy as np
import pytest
import scipy.linalg

from vec_ode_tpu.ops.expm import expm, expm_apply


def rand(d, seed=0, complex_=False, scale=1.0):
    rng = np.random.default_rng(seed)
    A = rng.standard_normal((d, d))
    if complex_:
        A = A + 1j * rng.standard_normal((d, d))
    return A * scale


@pytest.mark.parametrize("d", [2, 8, 64])
@pytest.mark.parametrize("complex_", [False, True])
def test_expm_matches_scipy(d, complex_):
    A = rand(d, seed=d, complex_=complex_, scale=1.0 / np.sqrt(d))
    got = np.asarray(expm(jnp.asarray(A)))
    want = scipy.linalg.expm(A)
    np.testing.assert_allclose(got, want, rtol=1e-11, atol=1e-11)


def test_expm_large_norm_squaring():
    # needs several squarings: ||A|| ~ 40
    A = rand(8, seed=3, scale=5.0)
    got = np.asarray(expm(jnp.asarray(A)))
    want = scipy.linalg.expm(A)
    np.testing.assert_allclose(got, want, rtol=1e-9, atol=1e-9 * np.abs(want).max())


def test_expm_batched_matches_loop():
    As = np.stack([rand(6, seed=s, complex_=True, scale=0.7) for s in range(5)])
    got = np.asarray(expm(jnp.asarray(As)))
    for i in range(5):
        np.testing.assert_allclose(
            got[i], scipy.linalg.expm(As[i]), rtol=1e-10, atol=1e-10
        )


def test_expm_batch_uniform_squaring_mixed_norms():
    # batch mixing tiny and large norms: uniform s must still be accurate
    As = np.stack([rand(4, seed=1, scale=0.01), rand(4, seed=2, scale=8.0)])
    got = np.asarray(expm(jnp.asarray(As)))
    for i in range(2):
        want = scipy.linalg.expm(As[i])
        np.testing.assert_allclose(
            got[i], want, rtol=1e-8, atol=1e-9 * np.abs(want).max()
        )


def test_expm_identity_and_zero():
    Z = jnp.zeros((3, 3))
    np.testing.assert_allclose(np.asarray(expm(Z)), np.eye(3), atol=1e-15)


def test_expm_vmap_and_jit():
    As = jnp.asarray(np.stack([rand(4, seed=s) for s in range(3)]))
    got = jax.jit(jax.vmap(expm))(As)
    for i in range(3):
        np.testing.assert_allclose(
            np.asarray(got[i]), scipy.linalg.expm(np.asarray(As[i])),
            rtol=1e-10, atol=1e-12,
        )


def test_expm_grad():
    # d/ds tr(expm(s*A)) at s=1 equals tr(A expm(A))
    A = jnp.asarray(rand(4, seed=7, scale=0.5))

    def f(s):
        return jnp.trace(expm(s * A))

    g = jax.grad(f)(1.0)
    want = np.trace(np.asarray(A) @ scipy.linalg.expm(np.asarray(A)))
    np.testing.assert_allclose(float(g), want, rtol=1e-8)


def test_expm_apply():
    A = jnp.asarray(rand(5, seed=9, complex_=True, scale=0.5))
    x = jnp.asarray(rand(5, seed=10, complex_=True)[:, 0])
    got = np.asarray(expm_apply(A, x))
    want = scipy.linalg.expm(np.asarray(A)) @ np.asarray(x)
    np.testing.assert_allclose(got, want, rtol=1e-10)


def test_expm_skew_hermitian_unitary():
    H = rand(8, seed=11, complex_=True)
    H = (H + H.conj().T) / 2
    U = np.asarray(expm(jnp.asarray(-1j * H)))
    np.testing.assert_allclose(U @ U.conj().T, np.eye(8), atol=1e-12)


def test_expm_rejects_nonsquare():
    with pytest.raises(ValueError):
        expm(jnp.zeros((3, 4)))


def test_taylor_method_matches_pade_f32():
    A = rand(16, seed=20, complex_=True, scale=2.0).astype(np.complex64)
    t = np.asarray(expm(jnp.asarray(A), method="taylor"))
    p = np.asarray(expm(jnp.asarray(A), method="pade13"))
    np.testing.assert_allclose(t, p, rtol=2e-5, atol=2e-6)
    want = scipy.linalg.expm(A.astype(np.complex128))
    np.testing.assert_allclose(t, want, rtol=2e-4, atol=2e-5)


def test_taylor_method_f64_accuracy():
    A = rand(8, seed=21, scale=1.5)
    t = np.asarray(expm(jnp.asarray(A), method="taylor"))
    want = scipy.linalg.expm(A)
    # taylor-12 at theta=1: ~4e-10 relative per scaling step
    np.testing.assert_allclose(t, want, rtol=5e-9, atol=5e-10)


def test_taylor_grad():
    A = jnp.asarray(rand(4, seed=22, scale=0.5))

    def f(s):
        return jnp.trace(expm(s * A, method="taylor"))

    g = jax.grad(f)(1.0)
    want = np.trace(np.asarray(A) @ scipy.linalg.expm(np.asarray(A)))
    np.testing.assert_allclose(float(g), want, rtol=1e-7)
