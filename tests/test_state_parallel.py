"""State-dimension sharding: row-parallel matvec + psum error norms on the
8-device virtual CPU mesh, vs unsharded golden results."""

import jax
import jax.numpy as jnp
import numpy as np

import vec_ode_tpu as vo
from vec_ode_tpu.models import stable_dense_matrix
from vec_ode_tpu.parallel.state_parallel import (
    ensemble_solve_state_sharded,
    mesh_2d,
    solve_linear_state_sharded,
)


def test_state_sharded_matches_unsharded():
    D = 64  # 8 devices x 8 rows
    A = jnp.asarray(stable_dense_matrix(D, seed=11), jnp.float64)
    y0 = jnp.asarray(np.random.default_rng(0).standard_normal(D))
    from vec_ode_tpu.parallel import ensemble_mesh

    mesh = ensemble_mesh(axis="state")
    ctl = vo.StepControl(rtol=1e-8, max_dt=0.5)

    sharded = solve_linear_state_sharded(
        A, y0, 0.0, 1.0, mesh=mesh, ctl=ctl, h0=1e-2,
    )
    plain = vo.solve_ivp(
        lambda t, y: jnp.einsum("ij,j->i", A, y,
                                precision=jax.lax.Precision.HIGHEST),
        0.0, 1.0, y0, ctl=ctl, h0=1e-2,
    )
    assert int(sharded.status) == vo.DONE
    np.testing.assert_allclose(
        np.asarray(sharded.y_final), np.asarray(plain.y_final), rtol=1e-12
    )
    # identical controller decisions: the psum'd norm equals the global norm
    assert int(sharded.n_accept) == int(plain.n_accept)
    assert int(sharded.n_reject) == int(plain.n_reject)
    np.testing.assert_allclose(float(sharded.h_final), float(plain.h_final),
                               rtol=1e-12)


def test_2d_mesh_traj_x_state():
    # 2-D mesh: 2 trajectory shards x 4 state shards
    D, B = 32, 6
    A = jnp.asarray(stable_dense_matrix(D, seed=12), jnp.float64)
    y0 = jnp.asarray(np.random.default_rng(1).standard_normal((B, D)))
    mesh = mesh_2d(2, 4)
    ctl = vo.StepControl(rtol=1e-8, max_dt=0.5)

    sols = ensemble_solve_state_sharded(
        A, y0, 0.0, 1.0, mesh=mesh, ctl=ctl, h0=1e-2,
    )
    assert sols.status.shape == (B,)
    assert all(int(s) == vo.DONE for s in sols.status)
    for i in range(B):
        ref = vo.solve_ivp(
            lambda t, y: jnp.einsum("ij,j->i", A, y,
                                    precision=jax.lax.Precision.HIGHEST),
            0.0, 1.0, y0[i], ctl=ctl, h0=1e-2,
        )
        np.testing.assert_allclose(
            np.asarray(sols.y_final[i]), np.asarray(ref.y_final), rtol=1e-11
        )
        assert int(sols.n_accept[i]) == int(ref.n_accept)


def test_mesh_2d_validation():
    try:
        mesh_2d(4, 4)  # 16 devices needed, only 8
        assert False
    except ValueError as e:
        assert "devices" in str(e)
