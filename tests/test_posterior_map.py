import numpy as np
import pandas as pd
import pytest

import jax
import jax.numpy as jnp

from bayes_drt_tpu.ops.matrices import (construct_A, construct_L,
                                        default_epsilon, get_tau_basis)
from bayes_drt_tpu.models.build import build_posterior
from bayes_drt_tpu.models.posterior import (constrain, init_unconstrained,
                                            log_density, make_log_density,
                                            predict_target)
from bayes_drt_tpu.infer.map import run_lbfgs, run_lbfgs_restarts

from scipy.special import gammaln as sc_gammaln


def load_spectrum(name):
    df = pd.read_csv(f"/root/reference/data/simulated/{name}")
    freq = df["Freq"].values
    Z = df["Zreal"].values + 1j * df["Zimag"].values
    idx = np.argsort(freq)[::-1]
    return freq[idx], Z[idx]


def series_setup(name="Z_ZARC_Macdonald_0.25.csv", mode="optimize"):
    freq, Z = load_spectrum(name)
    tau = get_tau_basis(freq)
    eps = default_epsilon(tau)
    f_coll = 1.0 / (2 * np.pi * tau)
    mats = {
        "A_re": np.asarray(construct_A(freq, "real", tau=tau, epsilon=eps)),
        "A_im": np.asarray(construct_A(freq, "imag", tau=tau, epsilon=eps)),
        "L0": np.asarray(construct_L(f_coll, tau=tau, epsilon=eps, order=0)),
        "L1": np.asarray(construct_L(f_coll, tau=tau, epsilon=eps, order=1)),
        "L2": np.asarray(construct_L(f_coll, tau=tau, epsilon=eps, order=2)),
    }
    z_scale = np.std(np.abs(Z)) / np.sqrt(len(Z) / 81)
    Zs = Z / z_scale
    dists = {"DRT": {"kernel": "DRT", "dist_type": "series"}}
    cfg, data = build_posterior(dists, {"DRT": mats}, freq, Zs, mode=mode)
    return cfg, data, dict(freq=freq, Z=Z, tau=tau, eps=eps, z_scale=z_scale,
                           mats=mats)


def golden_series_logdensity(data, uparams, jacobian):
    """Independent numpy implementation of the Series Stan model density
    (written directly from Series_modelcode.txt semantics)."""
    def inv_gamma(x, a, b):
        return np.sum(a * np.log(b) - sc_gammaln(a) - (a + 1) * np.log(x) - b / x)

    def stdn(x):
        return np.sum(-0.5 * x**2 - 0.5 * np.log(2 * np.pi))

    def normal(x, s):
        return np.sum(-0.5 * (x / s) ** 2 - np.log(s) - 0.5 * np.log(2 * np.pi))

    A = np.asarray(data.A[0])
    L0, L1, L2 = (np.asarray(data.L[0][i]) for i in range(3))
    target = np.asarray(data.target)
    freq = np.asarray(data.freq)
    n = len(freq)

    u = {k: np.asarray(v) for k, v in uparams.items()}
    lp = 0.0
    pos_keys = [k for k in u if k != "x_0"]  # series x unconstrained
    if jacobian:
        lp += sum(np.sum(u[k]) for k in pos_keys)

    Rinf_raw = np.exp(u["Rinf_raw"]); induc_raw = np.exp(u["induc_raw"])
    Rinf = Rinf_raw * 100; induc = induc_raw * float(data.induc_scale)
    x = u["x_0"]
    ups_raw = np.exp(u["ups_raw_0"]); ups = ups_raw * 0.15
    d = np.exp(u["d_strength_0"])
    sigma_res = np.exp(u["sigma_res_raw"]) * 0.05
    a_prop = np.exp(u["alpha_prop_raw"]) * 0.05
    a_re = np.exp(u["alpha_re_raw"]) * 0.05
    a_im = np.exp(u["alpha_im_raw"]) * 0.05

    lp += inv_gamma(d, 5, 5)
    lp += inv_gamma(ups_raw, float(data.ups_alpha), float(data.ups_beta))
    lp += stdn(Rinf_raw) + stdn(induc_raw)
    q = np.sqrt(d[0] * (L0 @ x) ** 2 + d[1] * (L1 @ x) ** 2 + d[2] * (L2 @ x) ** 2)
    lp += normal(q, ups)
    dups = 0.5 * (ups[1:-1] - 0.5 * (ups[:-2] + ups[2:])) / ups[1:-1]
    lp += stdn(dups)
    z_hat = A @ x
    z_hat = z_hat + Rinf * np.concatenate([np.ones(n), np.zeros(n)])
    z_hat = z_hat + induc * np.concatenate([np.zeros(n), 2 * np.pi * freq])
    zr = np.tile(z_hat[:n], 2); zi = np.tile(z_hat[n:], 2)
    st = np.sqrt(float(data.sigma_min) ** 2 + sigma_res**2 + (a_prop * z_hat) ** 2
                 + (a_re * zr) ** 2 + (a_im * zi) ** 2)
    lp += normal(target - z_hat, st)
    lp += stdn(np.exp(u["sigma_res_raw"])) + stdn(np.exp(u["alpha_prop_raw"]))
    lp += stdn(np.exp(u["alpha_re_raw"])) + stdn(np.exp(u["alpha_im_raw"]))
    return lp


@pytest.mark.parametrize("jacobian", [True, False])
def test_series_log_density_matches_golden(jacobian):
    cfg, data, aux = series_setup()
    key = jax.random.PRNGKey(0)
    params = init_unconstrained(cfg, data, key)
    lp = float(log_density(cfg, data, params, jacobian=jacobian))
    lp_ref = golden_series_logdensity(data, params, jacobian)
    np.testing.assert_allclose(lp, lp_ref, rtol=1e-10)


def test_log_density_grad_finite():
    cfg, data, aux = series_setup()
    params = init_unconstrained(cfg, data, jax.random.PRNGKey(1))
    g = jax.grad(lambda p: log_density(cfg, data, p))(params)
    for k, v in g.items():
        assert np.isfinite(np.asarray(v)).all(), k


def test_map_fit_recovers_zarc():
    cfg, data, aux = series_setup("Z_ZARC_Macdonald_0.25.csv", mode="optimize")
    loss = lambda p: -log_density(cfg, data, p, jacobian=False)
    init_fn = lambda k: init_unconstrained(cfg, data, k)
    # the posterior is multimodal from random inits (Stan shares this);
    # vmapped restarts pick the best optimum
    res = run_lbfgs_restarts(loss, init_fn, jax.random.PRNGKey(1234), 4,
                             max_iter=3000)
    assert np.isfinite(float(res.value))

    c = constrain(cfg, data, res.params)
    coef = np.asarray(c["x_0"]) * aux["z_scale"]

    # compare recovered distribution to the committed reference MAP output
    ref = pd.read_csv("/root/reference/code_EchemActa/map_results/Gout_ZARC_Macdonald_0.25.csv")
    Phi = np.exp(-((aux["eps"] * np.log(ref["tau"].values[:, None] / aux["tau"][None, :])) ** 2))
    gamma = Phi @ coef
    gt = pd.read_csv("/root/reference/data/simulated/gamma_ZARC.csv")
    Phi_gt = np.exp(-((aux["eps"] * np.log(gt["tau"].values[:, None] / aux["tau"][None, :])) ** 2))
    gamma_gt_eval = Phi_gt @ coef

    rp = np.trapezoid(gt["gamma"].values, np.log(gt["tau"].values))
    rmse_truth = np.sqrt(np.mean((gamma_gt_eval - gt["gamma"].values) ** 2))
    rmse_ref = np.sqrt(np.mean((gamma - ref["gamma"].values) ** 2))
    # recovered distribution should match ground truth about as well as the
    # reference MAP fit does, and be close to the reference's own recovery
    assert rmse_truth < 0.08 * rp, f"RMSE vs truth {rmse_truth} (Rp={rp})"
    assert rmse_ref < 0.08 * rp, f"RMSE vs reference MAP {rmse_ref} (Rp={rp})"

    # impedance fit quality
    pred = np.asarray(predict_target(cfg, data, c)) * aux["z_scale"]
    n = len(aux["freq"])
    Z_hat = pred[:n] + 1j * pred[n:]
    rel = np.abs(Z_hat - aux["Z"]) / np.abs(aux["Z"])
    assert np.median(rel) < 0.01

    # R_inf should be close to the simulation's true 1 Ohm offset
    rinf = float(c["Rinf"]) * aux["z_scale"]
    assert abs(rinf - 1.0) < 0.05, rinf
