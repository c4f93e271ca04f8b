"""Non-centered parameterization (ncp): exact change-of-variables identity
and end-to-end sampling equivalence.

The ncp form samples z with x = ups * z (free sign) or log x = u + log ups
(positive), adding log|J| = sum(log ups). It targets the IDENTICAL posterior
over (x, ups, ...) as the centered form — these tests pin that down.
"""

import numpy as np
import pandas as pd
import pytest

import jax
import jax.numpy as jnp

from bayes_drt_tpu.models.build import build_posterior
from bayes_drt_tpu.models.posterior import (constrain, init_unconstrained,
                                            log_density)


def _tiny_posterior(nonneg=False, ncp=False):
    rng = np.random.default_rng(0)
    n, k = 10, 7
    freq = np.logspace(4, -1, n)
    z = (1.0 + rng.standard_normal(n) * 0.05
         + 1j * (-0.3 + 0.05 * rng.standard_normal(n)))
    mats = {"A_re": rng.standard_normal((n, k)),
            "A_im": rng.standard_normal((n, k))}
    for o in (0, 1, 2):
        mats[f"L{o}"] = rng.standard_normal((k, k))
    dists = {"DRT": {"kernel": "DRT", "dist_type": "series"}}
    return build_posterior(dists, {"DRT": mats}, freq, z, mode="sample",
                           nonneg=nonneg, ncp=ncp)


@pytest.mark.parametrize("nonneg", [False, True])
def test_ncp_is_exact_change_of_variables(nonneg):
    cfg_c, data = _tiny_posterior(nonneg=nonneg, ncp=False)
    cfg_n, _ = _tiny_posterior(nonneg=nonneg, ncp=True)

    params_z = init_unconstrained(cfg_n, data, jax.random.PRNGKey(3))
    c_n = constrain(cfg_n, data, params_z)
    ups = np.asarray(c_n["ups_0"])

    # map the ncp draw to its centered-coordinates equivalent
    params_x = dict(params_z)
    if nonneg:
        params_x["x_0"] = params_z["x_0"] + jnp.log(jnp.asarray(ups))
    else:
        params_x["x_0"] = params_z["x_0"] * jnp.asarray(ups)

    # identical constrained quantities
    c_c = constrain(cfg_c, data, params_x)
    np.testing.assert_allclose(np.asarray(c_n["x_0"]), np.asarray(c_c["x_0"]),
                               rtol=1e-12)

    # free sign: densities differ by exactly the Jacobian sum(log ups).
    # nonneg: both parameterizations have |dx/du| = x, so the total
    # Jacobian is sum(log x) in each and the densities are EQUAL.
    lp_n = float(log_density(cfg_n, data, params_z, jacobian=True))
    lp_c = float(log_density(cfg_c, data, params_x, jacobian=True))
    offset = 0.0 if nonneg else float(np.sum(np.log(ups)))
    np.testing.assert_allclose(lp_n, lp_c + offset, rtol=1e-10)

    # without the sampling Jacobian the objectives agree at matched points
    lp_n0 = float(log_density(cfg_n, data, params_z, jacobian=False))
    lp_c0 = float(log_density(cfg_c, data, params_x, jacobian=False))
    np.testing.assert_allclose(lp_n0, lp_c0, rtol=1e-10)


def test_ncp_batch_sampling_recovers_truth():
    from bayes_drt_tpu.parallel import evaluate_gamma, fit_spectra_batch

    df = pd.read_csv("/root/reference/data/simulated/Z_ZARC_Macdonald_0.25.csv")
    freq = df["Freq"].values
    z = df["Zreal"].values + 1j * df["Zimag"].values
    rng = np.random.default_rng(0)
    zb = z[None, :] + 0.002 * (rng.standard_normal((2, len(z)))
                               + 1j * rng.standard_normal((2, len(z))))

    res = fit_spectra_batch(freq, zb, mode="sample", chains=2, warmup=150,
                            samples=100, max_tree_depth=6, random_seed=1,
                            ncp=True)
    gt = pd.read_csv("/root/reference/data/simulated/gamma_ZARC.csv")
    rp = np.trapezoid(gt["gamma"].values, np.log(gt["tau"].values))
    gam = evaluate_gamma(res, gt["tau"].values)
    rmse = float(np.sqrt(np.mean((gam.mean(axis=0) - gt["gamma"].values) ** 2)))
    assert rmse < 0.06 * rp, (rmse, rp)
    assert res.diagnostics["divergence_rate"].mean() < 0.05
