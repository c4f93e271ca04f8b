import numpy as np
import pytest

import jax.numpy as jnp

from bayes_drt_tpu.ops.matrices import construct_A, default_epsilon, get_tau_basis
from bayes_drt_tpu.ops.pallas_quad import construct_A_drt_pallas


@pytest.mark.parametrize("part", ["real", "imag"])
def test_pallas_matches_xla_quadrature(part):
    freq = np.logspace(6, -2, 81)
    tau = get_tau_basis(freq)
    eps = default_epsilon(tau)
    a_ref = np.asarray(construct_A(freq, part, tau=tau, epsilon=eps,
                                   n_quad=1024, dtype=jnp.float64))
    a_pl = np.asarray(construct_A_drt_pallas(freq, part, tau=tau, epsilon=eps,
                                             dtype=jnp.float64, interpret=True))
    np.testing.assert_allclose(a_pl, a_ref, rtol=1e-10, atol=1e-12)


def test_pallas_f32_accuracy():
    freq = np.logspace(5, -1, 40)
    tau = get_tau_basis(freq)
    eps = default_epsilon(tau)
    a_ref = np.asarray(construct_A(freq, "real", tau=tau, epsilon=eps,
                                   n_quad=1024, dtype=jnp.float64))
    a_pl = np.asarray(construct_A_drt_pallas(freq, "real", tau=tau,
                                             epsilon=eps, dtype=jnp.float32,
                                             interpret=True))
    np.testing.assert_allclose(a_pl, a_ref, rtol=2e-4, atol=1e-5)
