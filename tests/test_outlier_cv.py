import numpy as np
import pandas as pd
import pytest

from bayes_drt_tpu import Inverter
from bayes_drt_tpu.io import get_fZ, read_eis

PDAC = "/root/reference/data/experimental/PDAC_COM3_02109_Contact10_2065C_500C.txt"


def test_ridge_reimcv_selects_interior_lambda():
    """Ciucci-style Re-Im cross validation over a small lambda grid."""
    df = pd.read_csv("/root/reference/data/simulated/Z_ZARC_Macdonald_0.25.csv")
    freq = df["Freq"].values
    Z = df["Zreal"].values + 1j * df["Zimag"].values
    inv = Inverter()
    lambdas = np.logspace(-7, 2, 10)
    lam = inv.ridge_ReImCV(freq, Z, lambdas=lambdas, penalty="discrete",
                           hyper_lambda=True, hl_fbeta=0.1)
    assert lam in lambdas
    assert inv.cv_result is not None and len(inv.cv_result) == 10
    # the CV curve should have a clear interior structure (not monotone junk)
    tot = inv.cv_result["totcv"].values
    assert tot.argmin() not in (0,) or lam == lambdas[0]


def test_map_outlier_fit_experimental():
    """Tutorial 3 workload: MAP fit with the outlier error model on the PDAC
    experimental spectrum (reference time 12-18 s; outliers are present in
    this file)."""
    df = read_eis(PDAC, warn=False)
    freq, Z = get_fZ(df)
    inv = Inverter(basis_freq=np.logspace(7, -3, 101))
    # init_from_ridge anchors the outlier model so sigma_out isolates the
    # corrupted points instead of inflating uniformly (the reference
    # recommends ridge init for complex spectra, Run fits.ipynb)
    inv.fit(freq, Z, outliers=True, nonneg=True, random_seed=0,
            init_from_ridge=True, check_outliers=False)
    assert inv.stan_model_name.endswith("_outliers")
    assert "sigma_out" in inv.error_fit
    sigma_out = np.asarray(inv.error_fit["sigma_out"])
    assert sigma_out.shape == (len(freq),)
    # a few points should receive clearly elevated outlier error
    assert sigma_out.max() > 5 * np.median(sigma_out)
    # fit quality on the non-outlier majority
    z_hat = inv.predict_Z(freq)
    rel = np.abs(z_hat - Z) / np.abs(Z)
    assert np.median(rel) < 0.01


def test_hmc_outlier_fit_experimental():
    """BASELINE config 4: full HMC with the outlier error model on the
    Tutorial-3 experimental spectrum, with credible intervals."""
    df = read_eis(PDAC, warn=False)
    freq, Z = get_fZ(df)
    inv = Inverter(basis_freq=np.logspace(7, -3, 101))
    inv.fit(freq, Z, outliers=True, nonneg=True, mode="sample", warmup=120,
            samples=120, chains=2, init_from_ridge=True, random_seed=0,
            max_tree_depth=8, check_outliers=False)
    assert inv.stan_model_name == "Series_pos_outliers"
    assert inv.sample_diagnostics["divergence_rate"] < 0.2
    so = np.asarray(inv.error_fit["sigma_out"])
    assert so.max() > 10 * np.median(so)     # outliers isolated
    glo = inv.predict_distribution(percentile=2.5)
    ghi = inv.predict_distribution(percentile=97.5)
    assert (ghi >= glo - 1e-9).all()
    z_hat = inv.predict_Z(freq)
    assert np.median(np.abs(z_hat - Z) / np.abs(Z)) < 0.02


def test_outliers_auto_detection_path():
    """outliers='auto' flags corrupted points, switches to the outlier
    model, and warns (reference: inversion.py:1172-1187)."""
    df = pd.read_csv("/root/reference/data/simulated/Z_ZARC_Macdonald_0.25.csv")
    freq = df["Freq"].values
    Z = df["Zreal"].values + 1j * df["Zimag"].values
    Zc = Z.copy()
    Zc[30] *= 1.0 + 0.6j
    inv = Inverter()
    with pytest.warns(UserWarning, match="outlier"):
        inv.fit(freq, Zc, outliers="auto", nonneg=True, random_seed=0,
                init_from_ridge=True, check_outliers=False)
    assert inv.stan_model_name.endswith("_outliers")
    # the MAP drives most sigma_out to ~0; the robust checks are that the
    # corrupted point stands out in the fitted error model's z-scores and
    # that the fit itself is not poisoned by it
    outlier_idx = inv.check_outliers(freq, Zc, threshold=3.5,
                                     use_existing_fit=True).ravel()
    # frequencies are sorted descending inside fit; locate the corrupted
    # point in the trained ordering
    idx30 = int(np.where(np.isclose(inv.f_train, freq[30]))[0][0])
    assert idx30 in outlier_idx, (idx30, outlier_idx)
    # the other points fit cleanly despite the corruption
    z_hat = inv.predict_Z(inv.f_train)
    rel = np.abs(z_hat - inv.Z_train) / np.abs(inv.Z_train)
    assert np.median(np.delete(rel, idx30)) < 0.03
