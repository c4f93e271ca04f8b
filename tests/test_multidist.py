"""Multi-distribution and DDT workloads (reference Tutorial 5 /
"Run fits.ipynb" Series-Parallel cells)."""

import numpy as np
import pandas as pd
import pytest

from bayes_drt_tpu import Inverter


def load(name):
    df = pd.read_csv(f"/root/reference/data/simulated/{name}")
    return df["Freq"].values, df["Zreal"].values + 1j * df["Zimag"].values


def test_pure_ddt_map_fit():
    """Transmissive-planar DDT fit (Tutorial 5 workload)."""
    freq, Z = load("Z_BimodalTP-DDT_uniform_0.05.csv")
    inv = Inverter(distributions={
        "DDT": {"kernel": "DDT", "symmetry": "planar", "bc": "transmissive",
                "dist_type": "parallel",
                "basis_freq": np.logspace(6, -3, 91)}})
    inv.fit(freq, Z, random_seed=3, n_restarts=3)
    assert inv.fit_type == "map"
    assert inv.stan_model_name.startswith("Parallel")

    gt = pd.read_csv("/root/reference/data/simulated/gamma_BimodalTP-DDT.csv")
    gamma = inv.predict_distribution("DDT", eval_tau=gt["tau"].values)
    scale = np.max(np.abs(gt["gamma"].values))
    rmse = np.sqrt(np.mean((gamma - gt["gamma"].values) ** 2))
    assert rmse < 0.25 * scale, rmse

    z_hat = inv.predict_Z(freq)
    assert np.median(np.abs(z_hat - Z) / np.abs(Z)) < 0.02


def test_series_parallel_map_fit():
    """Simultaneous DRT + TP-DDT inversion (Series-Parallel model)."""
    freq, Z = load("Z_DRT-2-TpDDT_uniform_0.25.csv")
    inv = Inverter(distributions={
        "DRT": {"kernel": "DRT", "basis_freq": np.logspace(6, -2, 81)},
        "TP-DDT": {"kernel": "DDT", "symmetry": "planar", "bc": "transmissive",
                   "dist_type": "parallel",
                   "basis_freq": np.logspace(6, -2, 81), "x_scale": 0.8},
    })
    inv.fit(freq, Z, nonneg=True, random_seed=2, n_restarts=3)
    assert inv.stan_model_name.startswith("Series-Parallel")
    assert set(inv.distribution_fits) == {"DRT", "TP-DDT"}

    # impedance reconstruction is the end-to-end check
    z_hat = inv.predict_Z(freq)
    assert np.median(np.abs(z_hat - Z) / np.abs(Z)) < 0.03

    # recovered DDT should carry most of the low-frequency polarization;
    # compare against the committed truth columns (gamma=DRT, ftp=DDT)
    gt = pd.read_csv("/root/reference/data/simulated/gamma_DRT-2-TpDDT.csv")
    g_drt = inv.predict_distribution("DRT", eval_tau=gt["tau"].values)
    scale = np.max(np.abs(gt["gamma"].values))
    rmse = np.sqrt(np.mean((g_drt - gt["gamma"].values) ** 2))
    assert rmse < 0.5 * scale, rmse


def test_blocking_ddt_scaling_branch():
    """Blocking-planar parallel DDT triggers the Ystar admittance scaling
    (reference: inversion.py:2422-2434)."""
    freq, Z = load("Z_BimodalBP-DDT_uniform_0.05.csv")
    inv = Inverter(distributions={
        "DDT": {"kernel": "DDT", "symmetry": "planar", "bc": "blocking",
                "dist_type": "parallel",
                "basis_freq": np.logspace(6, -3, 91)}})
    inv.fit(freq, Z, random_seed=1, n_restarts=3)
    z_hat = inv.predict_Z(freq)
    # blocking DDT diverges at low frequency; check relative accuracy
    assert np.median(np.abs(z_hat - Z) / np.abs(Z)) < 0.05
