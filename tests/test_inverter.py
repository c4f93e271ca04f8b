"""Integration tests for the Inverter API (the reference's Tutorial 0/1
quick-start workloads)."""

import numpy as np
import pandas as pd
import pytest

from bayes_drt_tpu import Inverter


def load(name):
    df = pd.read_csv(f"/root/reference/data/simulated/{name}")
    return df["Freq"].values, df["Zreal"].values + 1j * df["Zimag"].values


def gamma_truth(name):
    df = pd.read_csv(f"/root/reference/data/simulated/{name}")
    return df["tau"].values, df["gamma"].values


def test_ridge_fit_quickstart():
    freq, Z = load("Z_ZARC_Macdonald_0.25.csv")
    inv = Inverter()
    inv.ridge_fit(freq, Z, preset="Huang")
    assert inv.fit_type == "ridge"

    tau_gt, g_gt = gamma_truth("gamma_ZARC.csv")
    gamma = inv.predict_distribution("DRT", eval_tau=tau_gt)
    rp = np.trapezoid(g_gt, np.log(tau_gt))
    rmse = np.sqrt(np.mean((gamma - g_gt) ** 2))
    assert rmse < 0.05 * rp

    z_hat = inv.predict_Z(freq)
    assert np.median(np.abs(z_hat - Z) / np.abs(Z)) < 0.02
    assert abs(inv.R_inf - 1.0) < 0.1
    assert abs(inv.predict_Rp() - rp) < 0.1 * rp
    assert inv.score(freq, Z, metric="r2") > 0.99


def test_map_fit_quickstart():
    freq, Z = load("Z_ZARC_Macdonald_0.25.csv")
    inv = Inverter()
    inv.fit(freq, Z, random_seed=0)
    assert inv.fit_type == "map"

    tau_gt, g_gt = gamma_truth("gamma_ZARC.csv")
    gamma = inv.predict_distribution(eval_tau=tau_gt)
    rp = np.trapezoid(g_gt, np.log(tau_gt))
    assert np.sqrt(np.mean((gamma - g_gt) ** 2)) < 0.08 * rp
    assert abs(inv.R_inf - 1.0) < 0.05
    # error structure present
    for k in ("sigma_tot", "sigma_res", "alpha_prop", "alpha_re", "alpha_im"):
        assert k in inv.error_fit
    # sigma prediction works on train and new frequencies
    s_re, s_im = inv.predict_sigma(freq)
    assert s_re.shape == (len(freq),)
    s_re2, _ = inv.predict_sigma(freq[:40])
    assert s_re2.shape == (40,)


def test_map_fit_with_ridge_init():
    freq, Z = load("Z_ZARC_Macdonald_0.25.csv")
    inv = Inverter()
    inv.fit(freq, Z, init_from_ridge=True, random_seed=0)
    tau_gt, g_gt = gamma_truth("gamma_ZARC.csv")
    gamma = inv.predict_distribution(eval_tau=tau_gt)
    rp = np.trapezoid(g_gt, np.log(tau_gt))
    assert np.sqrt(np.mean((gamma - g_gt) ** 2)) < 0.08 * rp


def test_map_fit_nonneg():
    freq, Z = load("Z_ZARC_Macdonald_0.25.csv")
    inv = Inverter()
    inv.fit(freq, Z, nonneg=True, random_seed=0)
    gamma = inv.predict_distribution()
    assert gamma.min() > -1e-10


def test_predict_Z_new_frequencies_and_subset():
    freq, Z = load("Z_ZARC_Macdonald_0.25.csv")
    inv = Inverter()
    inv.ridge_fit(freq, Z, preset="Huang")
    # subset of training frequencies reuses cached rows
    z_sub = inv.predict_Z(np.sort(freq)[::-1][:20])
    assert z_sub.shape == (20,)
    # completely new frequencies trigger fresh construction
    f_new = np.logspace(4, -1, 17)
    z_new = inv.predict_Z(f_new)
    assert np.isfinite(z_new).all()


def test_hmc_fit_quickstart():
    freq, Z = load("Z_ZARC_Macdonald_0.25.csv")
    inv = Inverter()
    inv.fit(freq, Z, mode="sample", warmup=120, samples=120, chains=2,
            random_seed=42)
    assert inv.fit_type == "bayes"
    tau_gt, g_gt = gamma_truth("gamma_ZARC.csv")
    gamma = inv.predict_distribution(eval_tau=tau_gt)
    rp = np.trapezoid(g_gt, np.log(tau_gt))
    assert np.sqrt(np.mean((gamma - g_gt) ** 2)) < 0.08 * rp
    # credible interval machinery
    glo = inv.predict_distribution(eval_tau=tau_gt, percentile=2.5)
    ghi = inv.predict_distribution(eval_tau=tau_gt, percentile=97.5)
    assert np.all(ghi >= glo - 1e-12)
    assert np.mean(ghi - glo) < 0.5 * rp
    # posterior impedance percentiles
    z_lo = inv.predict_Z(freq, percentile=2.5)
    z_hi = inv.predict_Z(freq, percentile=97.5)
    assert np.all(z_hi.real >= z_lo.real - 1e-12)
    # Rp percentile
    rp_lo = inv.predict_Rp(percentile=2.5)
    rp_hi = inv.predict_Rp(percentile=97.5)
    assert rp_lo < inv.predict_Rp() < rp_hi
    # with a short test budget the weakly-identified ups coordinates mix
    # slowly; just require no catastrophic non-convergence (longer chains
    # bring rhat_max toward 1, see test_nuts_drt.py for accuracy checks)
    assert inv.sample_diagnostics["rhat_max"] < 5.0
    assert inv.sample_diagnostics["ess_min"] > 2.0


def test_check_outliers_flags_corrupted_points():
    freq, Z = load("Z_ZARC_Macdonald_0.25.csv")
    Zc = Z.copy()
    Zc[25] *= 1.0 + 0.5j
    inv = Inverter()
    idx = inv.check_outliers(freq, Zc, threshold=3.5)
    # frequencies are sorted descending inside; index 25 stays index 25
    # because input is already descending
    assert 25 in set(idx.ravel())


def test_distribution_validation_errors():
    with pytest.raises(ValueError):
        Inverter(distributions={"bad": {"kernel": "XYZ"}})
    with pytest.raises(ValueError):
        Inverter(distributions={"d": {"kernel": "DDT", "ct": True}})
    with pytest.warns(UserWarning):
        Inverter(distributions={"d": {"kernel": "DRT", "dist_type": "parallel"}})


def test_init_from_ridge_parallel_distribution():
    """Ridge initialization of a single parallel DDT fit: the ridge R_inf
    for a parallel fit is the Python float 0.0, which the fit-program
    cache key must digest (progcache.data_shapes on scalar leaves)."""
    df = pd.read_csv(
        "/root/reference/data/simulated/Z_BimodalTP-DDT_uniform_0.05.csv")
    freq = df["Freq"].values
    Z = df["Zreal"].values + 1j * df["Zimag"].values
    inv = Inverter(distributions={
        "DDT": {"kernel": "DDT", "symmetry": "planar", "bc": "transmissive",
                "dist_type": "parallel",
                "basis_freq": np.logspace(6, -3, 91)}})
    inv.fit(freq, Z, init_from_ridge=True, random_seed=0,
            check_outliers=False)
    assert inv.fit_type == "map"
    z_hat = inv.predict_Z(freq)
    assert np.median(np.abs(z_hat - Z) / np.abs(Z)) < 0.05
