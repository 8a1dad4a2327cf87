import numpy as np

from vec_ode_tpu import tableaus as tb


def test_rkf45_matches_reference_literals():
    # Exact expressions from /root/reference/src/dat/mod.rs:9-27
    t = tb.RKF45_REFERENCE
    assert t.stages == 6
    np.testing.assert_array_equal(
        t.c, [0.0, 1 / 4, 3 / 8, 12 / 13, 1.0, 1 / 2]
    )
    np.testing.assert_array_equal(
        t.b, [16 / 135, 0, 6656 / 12825, 28561 / 56430, -9 / 50, 2 / 55]
    )
    np.testing.assert_array_equal(
        t.b_err, [25 / 216, 0, 1408 / 2565, 2197 / 4104, -1 / 5, 0]
    )
    assert t.a[1, 0] == 1 / 4
    assert t.a[3, 1] == -7200 / 2197
    # reference typo: -3544/2526 (dat/mod.rs:19); our default fixes it
    assert t.a[5, 2] == -3544 / 2526
    assert tb.RKF45.a[5, 2] == -3544 / 2565


def test_consistency_conditions():
    # sum(b) == 1 and row-sums of a equal c for all shipped tableaus
    for name, t in tb.TABLEAUS.items():
        np.testing.assert_allclose(t.b.sum(), 1.0, atol=1e-14, err_msg=name)
        if name == "rkf45_reference":
            continue  # reference typo breaks the row-sum identity at row 5
        np.testing.assert_allclose(
            t.a.sum(axis=1), t.c, atol=1e-13, err_msg=name
        )
        # explicit: strictly lower triangular
        assert np.allclose(np.triu(t.a), 0.0), name


def test_gl_nodes():
    # dat/mod.rs:4 literals
    np.testing.assert_allclose(
        tb.C_GAUSS_LEGENDRE_4,
        [0.21132486540518711775, 0.78867513459481288225],
        atol=1e-16,
    )
    np.testing.assert_allclose(tb.C_GAUSS_LEGENDRE_6.sum(), 1.5, atol=1e-15)


def test_split_coefficients_sum_to_one():
    # Total weight applied to each operator must be 1 under the palindromic
    # factor sequences of split_exp.rs map_exp.
    # RKN-O4 (split_exp.rs:507-516): each A factor used twice, B palindrome
    # b0 b1 b2 b3 b2 b1 b0.
    np.testing.assert_allclose(2 * tb.RKN_O4_A.sum(), 1.0, atol=1e-12)
    np.testing.assert_allclose(
        2 * tb.RKN_O4_B.sum() - tb.RKN_O4_B[-1], 1.0, atol=1e-12
    )
    # Triple jump (split_exp.rs:440-445): a0 a1 a0 / b0 b1 b1 b0.
    np.testing.assert_allclose(
        2 * tb.TJ_O4_A[0] + tb.TJ_O4_A[1], 1.0 + 0.0j, atol=1e-12
    )
    np.testing.assert_allclose(2 * tb.TJ_O4_B.sum(), 1.0 + 0.0j, atol=1e-12)
    # Semi-complex O4 (split_exp.rs:369-382): 4 A factors of 1/4 each,
    # B palindrome b0 b1 b2 b1 b0.
    np.testing.assert_allclose(tb.SEMI_COMPLEX_O4_A.sum(), 0.5, atol=1e-15)
    np.testing.assert_allclose(
        2 * (tb.SEMI_COMPLEX_O4_B[0] + tb.SEMI_COMPLEX_O4_B[1])
        + tb.SEMI_COMPLEX_O4_B[2],
        1.0 + 0.0j,
        atol=1e-15,
    )


def test_cfm_matrices():
    np.testing.assert_allclose(tb.CFM_R2_J1_GL.sum(), 1.0, atol=1e-15)
    np.testing.assert_allclose(tb.CFM_R4_J2_GL.sum(), 1.0, atol=1e-14)
    np.testing.assert_allclose(tb.BLANES17_R4_J4.sum(), 1.0, atol=1e-12)
    assert tb.CFM_R4_J2_GL.shape == (2, 2)
    assert tb.BLANES17_R4_J4.shape == (4, 3)
