"""Smoke coverage for less-common ridge options: cholesky penalty, mixed
reg_ord weights, L1 penalty, gamma hyperpriors (hyper_a/hyper_b), dZ
reweighting, hl_solution='lm', hyper_weights through the Inverter API."""

import numpy as np
import pandas as pd
import pytest

from bayes_drt_tpu import Inverter


@pytest.fixture(scope="module")
def data():
    df = pd.read_csv("/root/reference/data/simulated/Z_ZARC_Macdonald_0.25.csv")
    return df["Freq"].values, df["Zreal"].values + 1j * df["Zimag"].values


def check_recovery(inv, tol=0.10):
    gt = pd.read_csv("/root/reference/data/simulated/gamma_ZARC.csv")
    g = inv.predict_distribution("DRT", eval_tau=gt["tau"].values)
    rp = np.trapezoid(gt["gamma"].values, np.log(gt["tau"].values))
    rmse = np.sqrt(np.mean((g - gt["gamma"].values) ** 2))
    assert rmse < tol * rp, rmse
    return rmse


def test_cholesky_penalty(data):
    freq, Z = data
    inv = Inverter()
    inv.ridge_fit(freq, Z, penalty="cholesky", hyper_lambda=True, hl_beta=2.5,
                  lambda_0=1e-2)
    check_recovery(inv)


def test_mixed_reg_ord(data):
    freq, Z = data
    inv = Inverter()
    inv.ridge_fit(freq, Z, penalty="integral", reg_ord=[0.1, 0.3, 0.6],
                  weights="modulus")
    check_recovery(inv)


def test_l1_penalty(data):
    freq, Z = data
    inv = Inverter()
    inv.ridge_fit(freq, Z, penalty="integral", weights="modulus",
                  L1_penalty=0.05)
    check_recovery(inv, tol=0.15)


def test_hyper_b_and_a(data):
    freq, Z = data
    inv = Inverter()
    inv.ridge_fit(freq, Z, penalty="integral", weights="modulus",
                  hyper_b=True, sb=1)
    check_recovery(inv, tol=0.15)
    inv.ridge_fit(freq, Z, penalty="integral", weights="modulus",
                  hyper_a=True, hyper_b=True)
    check_recovery(inv, tol=0.15)


def test_dZ_reweighting(data):
    freq, Z = data
    inv = Inverter()
    inv.ridge_fit(freq, Z, penalty="integral", weights="modulus", dZ=True)
    check_recovery(inv, tol=0.15)


def test_lm_solution_via_api(data):
    freq, Z = data
    inv = Inverter()
    inv.ridge_fit(freq, Z, penalty="discrete", hl_solution="lm")
    check_recovery(inv)


def test_hyper_weights_via_api(data):
    freq, Z = data
    Zc = Z.copy()
    Zc[40] *= 1.3
    inv = Inverter()
    inv.ridge_fit(freq, Zc, hyper_lambda=False, hyper_weights=True,
                  lambda_0=1e-3)
    assert "weights" in inv.distribution_fits["DRT"]
    check_recovery(inv, tol=0.2)


def test_fit_inductance_false(data):
    freq, Z = data
    inv = Inverter(fit_inductance=False)
    inv.ridge_fit(freq, Z, preset="Huang")
    assert inv.inductance == 0.0
    check_recovery(inv)


def test_predict_subsets(data):
    freq, Z = data
    inv = Inverter()
    inv.ridge_fit(freq, Z, preset="Huang")
    z_no_offsets = inv.predict_Z(freq, include_offsets=False)
    z_full = inv.predict_Z(freq)
    np.testing.assert_allclose(z_full - z_no_offsets,
                               inv.R_inf + 1j * 2 * np.pi
                               * np.sort(freq)[::-1] * inv.inductance)
