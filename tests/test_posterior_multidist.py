"""Golden tests for the multi-distribution log densities.

Independent numpy implementations written directly from the Stan programs
(reference: bayes_drt/stan_model_files/Series-Parallel_pos_modelcode.txt and
Series-2Parallel_pos_modelcode.txt) verify that the parameterized JAX
posterior reproduces the Series-Parallel and Series-2Parallel model blocks
exactly — including the xp_raw/xp_scale split (penalty q and x_sum on the
RAW parallel coefficients, likelihood on the scaled ones) and the
mode-dependent x_sum_invscale.
"""

import numpy as np
import pandas as pd
import pytest

import jax

from scipy.special import gammaln as sc_gammaln

from bayes_drt_tpu.ops.matrices import construct_A, construct_L, default_epsilon
from bayes_drt_tpu.models.build import build_posterior, sort_distributions
from bayes_drt_tpu.models.posterior import init_unconstrained, log_density


def _load(name):
    df = pd.read_csv(f"/root/reference/data/simulated/{name}")
    freq = df["Freq"].values
    Z = df["Zreal"].values + 1j * df["Zimag"].values
    idx = np.argsort(freq)[::-1]
    return freq[idx], Z[idx]


def _dist_mats(freq, basis_freq, info):
    tau = 1.0 / (2 * np.pi * np.asarray(basis_freq, float))
    eps = default_epsilon(tau)
    f_coll = 1.0 / (2 * np.pi * tau)
    kw = dict(tau=tau, epsilon=eps, kernel=info.get("kernel", "DRT"),
              dist_type=info["dist_type"], symmetry=info.get("symmetry", "planar"),
              bc=info.get("bc", "transmissive"), ct=info.get("ct", False),
              k_ct=info.get("k_ct"))
    mats = {
        "A_re": np.asarray(construct_A(freq, "real", **kw)),
        "A_im": np.asarray(construct_A(freq, "imag", **kw)),
    }
    for o in (0, 1, 2):
        mats[f"L{o}"] = np.asarray(construct_L(f_coll, tau=tau, epsilon=eps, order=o))
    return mats


def _setup(dists, spectrum, mode, nonneg=True, basis_freq=None):
    freq, Z = _load(spectrum)
    if basis_freq is None:
        basis_freq = np.logspace(6, -2, 41)  # coarse basis: golden math only
    mats = {nm: _dist_mats(freq, info.get("basis_freq", basis_freq), info)
            for nm, info in dists.items()}
    z_scale = np.std(np.abs(Z)) / np.sqrt(len(Z) / 81)
    cfg, data = build_posterior(dists, mats, freq, Z / z_scale, mode=mode,
                                nonneg=nonneg)
    return cfg, data


def _inv_gamma(x, a, b):
    return np.sum(a * np.log(b) - sc_gammaln(a) - (a + 1) * np.log(x) - b / x)


def _stdn(x):
    return np.sum(-0.5 * np.asarray(x) ** 2 - 0.5 * np.log(2 * np.pi))


def _normal(x, s):
    return np.sum(-0.5 * (x / s) ** 2 - np.log(s) - 0.5 * np.log(2 * np.pi))


def golden_multidist_logdensity(cfg, data, uparams, jacobian):
    """Stan Series-Parallel / Series-2Parallel model-block density, written
    from the model files (Series-Parallel_pos_modelcode.txt:51-95,
    Series-2Parallel_pos_modelcode.txt:65-133): one series distribution
    (index 0 after canonical sort) plus 1-2 parallel distributions.

    All coefficient vectors are <lower=0> here (nonneg series), so every
    unconstrained parameter is exp-transformed.
    """
    u = {k: np.asarray(v) for k, v in uparams.items()}
    n = len(np.asarray(data.freq))
    target = np.asarray(data.target)
    freq = np.asarray(data.freq)

    lp = 0.0
    if jacobian:
        lp += sum(np.sum(v) for v in u.values())

    Rinf = np.exp(u["Rinf_raw"]) * 100.0
    induc = np.exp(u["induc_raw"]) * float(data.induc_scale)
    sigma_res = np.exp(u["sigma_res_raw"]) * 0.05
    a_prop = np.exp(u["alpha_prop_raw"]) * 0.05
    a_re = np.exp(u["alpha_re_raw"]) * 0.05
    a_im = np.exp(u["alpha_im_raw"]) * 0.05

    lp += _stdn(np.exp(u["Rinf_raw"])) + _stdn(np.exp(u["induc_raw"]))
    lp += _stdn(np.exp(u["sigma_res_raw"])) + _stdn(np.exp(u["alpha_prop_raw"]))
    lp += _stdn(np.exp(u["alpha_re_raw"])) + _stdn(np.exp(u["alpha_im_raw"]))

    z_hat = Rinf * np.concatenate([np.ones(n), np.zeros(n)])
    z_hat = z_hat + induc * np.concatenate([np.zeros(n), 2 * np.pi * freq])
    x_sum_raw = 0.0
    for i, dist in enumerate(cfg.dists):
        x_raw = np.exp(u[f"x_{i}"])
        x_scaled = x_raw * float(data.x_scales[i])
        ups_raw = np.exp(u[f"ups_raw_{i}"])
        ups = ups_raw * 0.15
        d = np.exp(u[f"d_strength_{i}"])
        L0, L1, L2 = (np.asarray(data.L[i][j]) for j in range(3))
        # qs on xs; qp on xp_RAW (Series-2Parallel_pos_modelcode.txt:68-70)
        q = np.sqrt(d[0] * (L0 @ x_raw) ** 2 + d[1] * (L1 @ x_raw) ** 2
                    + d[2] * (L2 @ x_raw) ** 2)
        lp += _inv_gamma(d, 5.0, 5.0)
        lp += _inv_gamma(ups_raw, float(data.ups_alpha), float(data.ups_beta))
        lp += _normal(q, ups)
        dups = 0.5 * (ups[1:-1] - 0.5 * (ups[:-2] + ups[2:])) / ups[1:-1]
        lp += _stdn(dups)
        x_sum_raw += np.sum(x_raw)

        A = np.asarray(data.A[i])
        if dist.dist_type == "series":
            z_hat = z_hat + A @ x_scaled
        else:
            # Y_hat = Ap @ xp (SCALED), complex-inverted elementwise
            # (Series-2Parallel_pos_modelcode.txt:79-88)
            y = A @ x_scaled
            y_re, y_im = y[:n], y[n:]
            denom = y_re**2 + y_im**2
            z_hat = z_hat + np.concatenate([y_re / denom, -y_im / denom])

    # x_sum on the RAW sums (Series-2Parallel_pos_modelcode.txt:71-72, 116)
    lp += _stdn(x_sum_raw * float(data.x_sum_invscale))

    zr = np.tile(z_hat[:n], 2)
    zi = np.tile(z_hat[n:], 2)
    st = np.sqrt(float(data.sigma_min) ** 2 + sigma_res**2 + (a_prop * z_hat) ** 2
                 + (a_re * zr) ** 2 + (a_im * zi) ** 2)
    lp += _normal(target - z_hat, st)
    return lp


SP_DISTS = {
    "DRT": {"kernel": "DRT", "dist_type": "series"},
    "TP-DDT": {"kernel": "DDT", "dist_type": "parallel", "symmetry": "planar",
               "bc": "transmissive", "x_scale": 0.8},
}

S2P_DISTS = {
    "DRT": {"kernel": "DRT", "dist_type": "series"},
    "TP-DDT": {"kernel": "DDT", "dist_type": "parallel", "symmetry": "planar",
               "bc": "transmissive", "x_scale": 0.8},
    "BP-DDT": {"kernel": "DDT", "dist_type": "parallel", "symmetry": "planar",
               "bc": "blocking", "x_scale": 1.0},
}


@pytest.mark.parametrize("mode", ["optimize", "sample"])
@pytest.mark.parametrize("jacobian", [True, False])
def test_series_parallel_density_matches_golden(mode, jacobian):
    cfg, data = _setup(SP_DISTS, "Z_DRT-2-TpDDT_uniform_0.25.csv", mode)
    assert cfg.model_name().startswith("Series-Parallel")
    assert float(data.x_sum_invscale) == (1.0 if mode == "sample" else 0.0)
    for seed in (0, 1, 2):
        params = init_unconstrained(cfg, data, jax.random.PRNGKey(seed))
        lp = float(log_density(cfg, data, params, jacobian=jacobian))
        lp_ref = golden_multidist_logdensity(cfg, data, params, jacobian)
        np.testing.assert_allclose(lp, lp_ref, rtol=1e-10)


@pytest.mark.parametrize("mode", ["optimize", "sample"])
@pytest.mark.parametrize("jacobian", [True, False])
def test_series_2parallel_density_matches_golden(mode, jacobian):
    cfg, data = _setup(S2P_DISTS, "Z_DRT-TpDDT-BpDDT_uniform_0.25.csv", mode)
    assert cfg.model_name().startswith("Series-2Parallel")
    assert float(data.x_sum_invscale) == (0.1 if mode == "sample" else 0.0)
    # canonical order: series first, then parallel sorted by name ->
    # BP-DDT is parallel #1 (x_scale 1), TP-DDT #2 (x_scale 0.8), matching
    # the reference's sorted order (inversion.py:1962-1968)
    assert [d.name for d in cfg.dists] == ["DRT", "BP-DDT", "TP-DDT"]
    assert float(data.x_scales[1]) == 1.0 and float(data.x_scales[2]) == 0.8
    for seed in (0, 1, 2):
        params = init_unconstrained(cfg, data, jax.random.PRNGKey(seed))
        lp = float(log_density(cfg, data, params, jacobian=jacobian))
        lp_ref = golden_multidist_logdensity(cfg, data, params, jacobian)
        np.testing.assert_allclose(lp, lp_ref, rtol=1e-10)


def test_series_2parallel_gradient_finite():
    cfg, data = _setup(S2P_DISTS, "Z_DRT-TpDDT-BpDDT_uniform_0.25.csv", "sample")
    params = init_unconstrained(cfg, data, jax.random.PRNGKey(3))
    g = jax.grad(lambda p: log_density(cfg, data, p))(params)
    for k, v in g.items():
        assert np.isfinite(np.asarray(v)).all(), k
