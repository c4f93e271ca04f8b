import numpy as np
import pytest
from scipy.integrate import quad

from bayes_drt_tpu.ops.matrices import (
    construct_A,
    construct_L,
    construct_M,
    default_epsilon,
    get_tau_basis,
)

from reference_impl import (
    construct_A_golden,
    construct_L_golden,
    construct_M_golden,
    drt_integrand,
)

FREQ = np.logspace(6, -2, 81)


def test_tau_basis_default():
    tau = get_tau_basis(FREQ)
    # one decade beyond the measured range on each side, 10 ppd
    assert np.isclose(tau[0], 10 ** (np.log10(1 / (2 * np.pi * FREQ[0])) - 1))
    assert np.isclose(tau[-1], 10 ** (np.log10(1 / (2 * np.pi * FREQ[-1])) + 1))
    n_decades = np.log10(tau[-1] / tau[0])
    assert len(tau) == int(10 * n_decades + 1)


def test_default_epsilon():
    tau = get_tau_basis(FREQ)
    eps = default_epsilon(tau)
    assert np.isclose(eps, 1.0 / np.mean(np.diff(np.log(tau))))


@pytest.mark.parametrize("part", ["real", "imag"])
def test_drt_A_matches_golden(part):
    tau = get_tau_basis(FREQ)
    eps = default_epsilon(tau)
    A = np.asarray(construct_A(FREQ, part, tau=tau, epsilon=eps))
    A_ref = construct_A_golden(FREQ, part, tau=tau, eps=eps)
    np.testing.assert_allclose(A, A_ref, rtol=1e-8, atol=1e-12)


def test_drt_A_real_close_to_adaptive_quad():
    # trapezoid on [-20, 20] with 1000 points should agree with adaptive
    # quadrature to much better than 1e-6 for the smooth DRT integrand
    freq = np.logspace(3, -1, 5)
    omega = 2 * np.pi * freq
    tau = 1.0 / omega
    A = np.asarray(construct_A(freq, "real", tau=tau, epsilon=1.0))
    for n, w in enumerate(omega):
        for m, t in enumerate(tau):
            val, _ = quad(lambda y: drt_integrand(y, w, t, 1.0, "real"), -np.inf, np.inf)
            assert abs(A[n, m] - val) < 1e-8


@pytest.mark.parametrize("bc,symmetry", [
    ("transmissive", "planar"),
    ("blocking", "planar"),
    ("blocking", "spherical"),
])
@pytest.mark.parametrize("part", ["real", "imag"])
@pytest.mark.parametrize("dist_type", ["parallel", "series"])
def test_ddt_A_matches_golden(bc, symmetry, part, dist_type):
    freq = np.logspace(3, -1, 21)
    tau = get_tau_basis(freq)
    eps = default_epsilon(tau)
    A = np.asarray(construct_A(freq, part, tau=tau, epsilon=eps, kernel="DDT",
                               dist_type=dist_type, symmetry=symmetry, bc=bc))
    A_ref = construct_A_golden(freq, part, tau=tau, eps=eps, kernel="DDT",
                               dist_type=dist_type, symmetry=symmetry, bc=bc)
    np.testing.assert_allclose(A, A_ref, rtol=1e-6, atol=1e-9)


def test_ddt_A_with_charge_transfer():
    freq = np.logspace(3, -1, 11)
    tau = get_tau_basis(freq)
    A = np.asarray(construct_A(freq, "real", tau=tau, epsilon=1.0, kernel="DDT",
                               dist_type="parallel", symmetry="planar",
                               bc="transmissive", ct=True, k_ct=100.0))
    A_ref = construct_A_golden(freq, "real", tau=tau, eps=1.0, kernel="DDT",
                               dist_type="parallel", symmetry="planar",
                               bc="transmissive", ct=True, k_ct=100.0)
    np.testing.assert_allclose(A, A_ref, rtol=1e-6, atol=1e-9)


@pytest.mark.parametrize("order", [0, 1, 2, 3, [0.5, 0.3, 0.2]])
def test_L_matches_golden(order):
    tau = get_tau_basis(FREQ)
    eps = default_epsilon(tau)
    f_coll = 1.0 / (2 * np.pi * tau)
    L = np.asarray(construct_L(f_coll, tau=tau, epsilon=eps, order=order))
    L_ref = construct_L_golden(f_coll, tau=tau, eps=eps, order=order)
    np.testing.assert_allclose(L, L_ref, rtol=1e-10, atol=1e-10)


@pytest.mark.parametrize("order", [0, 1, 2])
def test_M_matches_golden(order):
    tau = get_tau_basis(FREQ)
    eps = default_epsilon(tau)
    f_coll = 1.0 / (2 * np.pi * tau)
    M = np.asarray(construct_M(f_coll, order=order, epsilon=eps))
    M_ref = construct_M_golden(f_coll, order=order, eps=eps)
    np.testing.assert_allclose(M, M_ref, rtol=1e-10, atol=1e-10)
    # symmetric
    np.testing.assert_allclose(M, M.T, rtol=1e-10, atol=1e-10)


def test_M_positive_semidefinite():
    tau = get_tau_basis(FREQ)
    eps = default_epsilon(tau)
    f_coll = 1.0 / (2 * np.pi * tau)
    for order in [0, 1, 2]:
        M = np.asarray(construct_M(f_coll, order=order, epsilon=eps))
        eigs = np.linalg.eigvalsh(M)
        assert eigs.min() > -1e-8 * abs(eigs.max())


def test_zarc_impedance_recovery():
    """A' x for a discretized ZARC DRT should reproduce the analytic ZARC Z."""
    # ZARC: Z = R / (1 + (j w t0)^phi); DRT gamma(tau) known analytically
    R, t0, phi = 1.0, 1e-3, 0.8
    freq = np.logspace(6, -2, 81)
    omega = 2 * np.pi * freq
    tau = np.logspace(-9, 3, 121)
    eps = default_epsilon(tau)

    # project the analytic ZARC DRT onto the RBF basis via ridge collocation
    def zarc_drt(t):
        return (R / (2 * np.pi)) * np.sin((1 - phi) * np.pi) / (
            np.cosh(phi * np.log(t / t0)) - np.cos((1 - phi) * np.pi))

    Phi = np.exp(-((eps * np.log(tau[:, None] / tau[None, :])) ** 2))
    x = np.linalg.solve(Phi + 1e-8 * np.eye(len(tau)), zarc_drt(tau))

    A_re = np.asarray(construct_A(freq, "real", tau=tau, epsilon=eps))
    A_im = np.asarray(construct_A(freq, "imag", tau=tau, epsilon=eps))
    Z_pred = A_re @ x + 1j * (A_im @ x)
    Z_true = R / (1 + (1j * omega * t0) ** phi)
    np.testing.assert_allclose(Z_pred.real, Z_true.real, atol=2e-3 * R)
    np.testing.assert_allclose(Z_pred.imag, Z_true.imag, atol=2e-3 * R)
