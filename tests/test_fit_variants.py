"""Coverage for the remaining fit variants: fitY, generic MultiDist,
part='real'/'imag' likelihood masks."""

import numpy as np
import pandas as pd
import pytest

from bayes_drt_tpu import Inverter
from bayes_drt_tpu.models.posterior import PosteriorConfig, DistConfig


def load(name):
    df = pd.read_csv(f"/root/reference/data/simulated/{name}")
    return df["Freq"].values, df["Zreal"].values + 1j * df["Zimag"].values


def test_fitY_admittance_fit():
    freq, Z = load("Z_BimodalTP-DDT_uniform_0.05.csv")
    inv = Inverter(distributions={
        "DDT": {"kernel": "DDT", "symmetry": "planar", "bc": "transmissive",
                "dist_type": "parallel",
                "basis_freq": np.logspace(6, -3, 91)}})
    inv.fit(freq, Z, fitY=True, random_seed=0, n_restarts=2)
    assert inv.stan_model_name == "Parallel_fitY"
    assert inv.R_inf == 0 and inv.inductance == 0
    # fitY fits the admittance directly: Y_hat = A x must track Y = 1/Z
    order = np.argsort(freq)[::-1]
    f_s, Y_s = freq[order], (1.0 / Z)[order]
    mat = inv._get_prediction_matrices(f_s, ["DDT"])["DDT"]
    coef = inv.distribution_fits["DDT"]["coef"]
    y_hat = mat["A_re"] @ coef + 1j * (mat["A_im"] @ coef)
    rel = np.abs(y_hat - Y_s) / np.abs(Y_s)
    assert np.median(rel) < 0.05, np.median(rel)


_DDT41 = {"kernel": "DDT", "symmetry": "planar", "bc": "transmissive",
          "dist_type": "parallel", "basis_freq": np.logspace(6, -3, 41)}


def _fitY_yhat(inv, freq, Z):
    order = np.argsort(freq)[::-1]
    f_s, Y_s = freq[order], (1.0 / Z)[order]
    mat = inv._get_prediction_matrices(f_s, ["DDT"])["DDT"]
    coef = inv.distribution_fits["DDT"]["coef"]
    return Y_s, mat["A_re"] @ coef + 1j * (mat["A_im"] @ coef)


def test_sa_row_scaling_matches_plain_fitY():
    """SA equilibrates the design-matrix rows but keeps the likelihood in
    unscaled admittance space (Parallel_fitY_SA_modelcode.txt:45-46) — the
    posterior is algebraically identical to the plain fitY model, so the
    MAP recovery must agree (it is purely a conditioning experiment,
    reference: inversion.py:1756-1810)."""
    freq, Z = load("Z_BimodalTP-DDT_uniform_0.05.csv")
    res = {}
    for kw in ({}, {"SA": True}):
        inv = Inverter(distributions={"DDT": dict(_DDT41)})
        inv.fit(freq, Z, fitY=True, random_seed=0, n_restarts=2, **kw)
        res[bool(kw)] = _fitY_yhat(inv, freq, Z) + (inv.stan_model_name,)
    assert res[True][2] == "Parallel_fitY_SA"
    Y_s, yh_plain, _ = res[False]
    _, yh_sa, _ = res[True]
    # both track the admittance...
    assert np.median(np.abs(yh_sa - Y_s) / np.abs(Y_s)) < 0.05
    # ...and agree with each other far more tightly than with the data
    rel = np.abs(yh_sa - yh_plain) / np.abs(Y_s)
    assert np.median(rel) < 5e-3, np.median(rel)


def test_sasy_scaled_space_fit():
    """SASY fits the plain fitY model in S-scaled admittance space
    (reference: inversion.py:1823-1866) — a different, relative-error-like
    error model; the recovery must still track the true admittance. Model
    name carries no suffix (the reference loads Parallel_fitY for it)."""
    freq, Z = load("Z_BimodalTP-DDT_uniform_0.05.csv")
    inv = Inverter(distributions={"DDT": dict(_DDT41)})
    inv.fit(freq, Z, fitY=True, SASY=True, random_seed=0, n_restarts=2)
    assert inv.stan_model_name == "Parallel_fitY"
    Y_s, yh = _fitY_yhat(inv, freq, Z)
    assert np.median(np.abs(yh - Y_s) / np.abs(Y_s)) < 0.05


def test_sa_sasy_validation():
    freq, Z = load("Z_ZARC_Macdonald_0.25.csv")
    with pytest.raises(ValueError, match="only valid with fitY"):
        Inverter().fit(freq, Z, SA=True)
    inv = Inverter(distributions={"DDT": dict(_DDT41)})
    with pytest.raises(ValueError, match="mutually exclusive"):
        inv.fit(freq, Z, fitY=True, SA=True, SASY=True)


def test_fitY_requires_parallel():
    freq, Z = load("Z_ZARC_Macdonald_0.25.csv")
    inv = Inverter()
    with pytest.raises(ValueError):
        inv.fit(freq, Z, fitY=True)


def test_multidist_model_name():
    # 2 series + 1 parallel -> MultiDist generalization
    cfg = PosteriorConfig(dists=(
        DistConfig("a", "series", "DRT", 10),
        DistConfig("b", "series", "DDT", 10),
        DistConfig("c", "parallel", "DDT", 10)))
    assert cfg.model_name() == "MultiDist"
    cfg2 = PosteriorConfig(dists=(DistConfig("a", "series", "DRT", 10),
                                  DistConfig("c", "parallel", "DDT", 10)))
    assert cfg2.model_name() == "Series-Parallel"


def test_multidist_two_series_fit():
    """Two series distributions (DRT + series DDT) exercise the MultiDist
    generalization end-to-end (the reference notes MultiDist accuracy is
    'suboptimal', inversion.py:1588-1590; additive series pairs are the
    well-conditioned case)."""
    freq, Z = load("Z_ZARC_Macdonald_0.25.csv")
    inv = Inverter(distributions={
        "DRT": {"kernel": "DRT"},
        "S-DDT": {"kernel": "DDT", "dist_type": "series", "symmetry": "planar",
                  "bc": "transmissive"},
    })
    inv.fit(freq, Z, nonneg=True, random_seed=0, n_restarts=3, max_iter=1500,
            check_outliers=False)
    assert inv.stan_model_name.startswith("MultiDist")
    assert set(inv.distribution_fits) == {"DRT", "S-DDT"}
    z_hat = inv.predict_Z(freq)
    assert np.median(np.abs(z_hat - Z) / np.abs(Z)) < 0.05


def test_part_real_imag_fit():
    """The masked-likelihood part fits (PARITY.md known deviation: the
    reference zero-fills the excluded component, we mask it out of the
    likelihood) must actually RECOVER from the kept component alone: the
    imaginary part identifies the distribution, the real part identifies
    the distribution plus R_inf."""
    freq, Z = load("Z_ZARC_Macdonald_0.25.csv")
    gt = pd.read_csv("/root/reference/data/simulated/gamma_ZARC.csv")
    rp = np.trapezoid(gt["gamma"].values, np.log(gt["tau"].values))

    inv = Inverter()
    inv.fit(freq, Z, part="imag", random_seed=0, n_restarts=4,
            check_outliers=False)
    # the kept (imaginary) component is actually fit, not just finite
    z_hat = inv.predict_Z(freq)
    order = np.argsort(freq)[::-1]
    rel_im = np.median(np.abs(z_hat.imag - Z[order].imag)
                       / np.maximum(np.abs(Z[order].imag), 1e-3))
    assert rel_im < 0.05, rel_im
    # and the distribution is recovered from Z'' alone
    g = inv.predict_distribution("DRT", eval_tau=gt["tau"].values)
    rmse = np.sqrt(np.mean((g - gt["gamma"].values) ** 2))
    assert rmse < 0.10 * rp, rmse

    inv_r = Inverter()
    inv_r.fit(freq, Z, part="real", random_seed=0, n_restarts=4,
              check_outliers=False)
    # Z' identifies R_inf (true value 1.0 for the ZARC circuit)
    assert abs(inv_r.R_inf - 1.0) < 0.15, inv_r.R_inf
    g_r = inv_r.predict_distribution("DRT", eval_tau=gt["tau"].values)
    rmse_r = np.sqrt(np.mean((g_r - gt["gamma"].values) ** 2))
    assert rmse_r < 0.12 * rp, rmse_r


def test_ridge_part_offset_recovery():
    """Ridge part fits recover the EXCLUDED component's offsets by the
    reference's post-step (reference: inversion.py:854-873): R_inf by
    1-D least squares after an imag-only fit, inductance after a
    real-only fit."""
    freq, Z = load("Z_ZARC-RL_uniform_0.25.csv")
    inv_b = Inverter(fit_inductance=True)
    inv_b.ridge_fit(freq, Z, preset="Huang")
    inv_i = Inverter(fit_inductance=True)
    inv_i.ridge_fit(freq, Z, part="imag", preset="Huang")
    inv_r = Inverter(fit_inductance=True)
    inv_r.ridge_fit(freq, Z, part="real", preset="Huang")
    # imag-only: R_inf comes from the post-step, matches the both-fit
    assert abs(inv_i.R_inf - inv_b.R_inf) < 0.1 * abs(inv_b.R_inf), (
        inv_i.R_inf, inv_b.R_inf)
    # real-only: inductance comes from the post-step, matches the both-fit
    assert abs(inv_r.inductance - inv_b.inductance) < (
        0.25 * abs(inv_b.inductance) + 1e-8), (inv_r.inductance,
                                               inv_b.inductance)


def test_add_model_data_overrides():
    """The add_stan_data equivalent (reference: inversion.py:1143-1145):
    overriding PosteriorData fields changes the fitted model end-to-end."""
    freq, Z = load("Z_ZARC_uniform_1.0.csv")
    inv = Inverter()
    inv.fit(freq, Z, outliers=True, random_seed=0, n_restarts=2,
            add_model_data={"ups_alpha": 0.5, "sigma_out_lambda": 5.0})
    cfg, data = inv._posterior
    assert float(data.ups_alpha) == 0.5
    assert float(data.sigma_out_lambda) == 5.0
    lp_override = inv._opt_result["lp__"]
    coef_override = inv.distribution_fits["DRT"]["coef"].copy()

    inv2 = Inverter()
    inv2.fit(freq, Z, outliers=True, random_seed=0, n_restarts=2)
    assert float(inv2._posterior[1].ups_alpha) == 0.05  # optimize default
    # the override must actually change the optimum
    assert not np.allclose(coef_override, inv2.distribution_fits["DRT"]["coef"])
    assert lp_override != inv2._opt_result["lp__"]

    with pytest.raises(ValueError, match="Unknown PosteriorData fields"):
        inv.fit(freq, Z, add_model_data={"not_a_field": 1.0})


def test_custom_log_density():
    """The model_str equivalent (reference: inversion.py:1146-1147): a
    user-supplied log density replaces the built-in model while reusing
    matrices, scaling, solvers and extraction."""
    from bayes_drt_tpu.models.posterior import log_density

    calls = {"n": 0}

    def tight_rinf_density(cfg, data, params, jacobian=True):
        # built-in model plus a hard prior pinning R_inf near 2 (scaled)
        calls["n"] += 1
        import jax.numpy as jnp
        rinf = jnp.exp(params["Rinf_raw"]) * 100.0
        return (log_density(cfg, data, params, jacobian=jacobian)
                - 0.5 * ((rinf - 2.0) / 0.001) ** 2)

    freq, Z = load("Z_ZARC_uniform_1.0.csv")
    inv = Inverter()
    inv.fit(freq, Z, random_seed=0, n_restarts=2,
            log_density_fn=tight_rinf_density)
    assert calls["n"] > 0
    # the custom prior pins the SCALED R_inf at 2 -> unscaled 2 * Z_scale
    assert abs(inv.R_inf / inv._Z_scale - 2.0) < 0.01


def test_multidist_sampling_smoke():
    """The MultiDist generalization also samples: two series distributions
    through full NUTS at a small budget produce finite draws, credible
    intervals, and a good impedance reconstruction (reference marks
    MultiDist as a performance-warning path, inversion.py:1588-1590)."""
    freq, Z = load("Z_ZARC_Macdonald_0.25.csv")
    inv = Inverter(distributions={
        "DRT": {"kernel": "DRT"},
        "S-DDT": {"kernel": "DDT", "dist_type": "series", "symmetry": "planar",
                  "bc": "transmissive"},
    })
    inv.fit(freq, Z, mode="sample", nonneg=True, random_seed=0, warmup=100,
            samples=100, chains=2, max_tree_depth=6, check_outliers=False)
    assert inv.stan_model_name.startswith("MultiDist")
    assert inv.fit_type == "bayes"
    z_hat = inv.predict_Z(freq)
    assert np.median(np.abs(z_hat - Z) / np.abs(Z)) < 0.05
    # credible band exists and brackets the mean for both distributions
    for name in ("DRT", "S-DDT"):
        tau = inv.distributions[name]["tau"]
        lo = inv.predict_distribution(name, eval_tau=tau, percentile=2.5)
        hi = inv.predict_distribution(name, eval_tau=tau, percentile=97.5)
        mean = inv.predict_distribution(name, eval_tau=tau)
        assert np.isfinite(lo).all() and np.isfinite(hi).all()
        assert (lo <= mean + 1e-9).all() and (mean <= hi + 1e-9).all()
