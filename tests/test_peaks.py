import numpy as np
import pandas as pd
import pytest

from bayes_drt_tpu import Inverter
from bayes_drt_tpu.peaks import (HN_distribution, HN_impedance,
                                 constrained_peak_fit, evaluate_fit_distribution,
                                 evaluate_fit_impedance, fit_peaks)


def test_hn_distribution_special_cases():
    tau = np.logspace(-6, 0, 200)
    t0 = 1e-3
    # alpha=1: ZARC DRT closed form
    phi = 0.8
    g_hn = np.asarray(HN_distribution(tau, t0, 1.0, phi))
    g_zarc = (1 / (2 * np.pi)) * np.sin((1 - phi) * np.pi) / (
        np.cosh(phi * np.log(tau / t0)) - np.cos((1 - phi) * np.pi))
    np.testing.assert_allclose(g_hn, g_zarc, rtol=1e-6, atol=1e-12)


def test_hn_impedance_matches_distribution_integral():
    # Z_HN(f) should equal the integral of the HN DRT over d ln tau
    t0, alpha, beta = 1e-3, 0.9, 0.85
    freq = np.logspace(3, -1, 10)
    tau = np.logspace(-9, 3, 4000)
    g = np.asarray(HN_distribution(tau, t0, alpha, beta))
    omega = 2 * np.pi * freq
    kern = 1.0 / (1.0 + 1j * omega[:, None] * tau[None, :])
    z_int = np.trapezoid(g[None, :] * kern, np.log(tau), axis=1)
    z_hn = np.asarray(HN_impedance(freq, t0, alpha, beta))
    np.testing.assert_allclose(z_int.real, z_hn.real, atol=2e-3)
    np.testing.assert_allclose(z_int.imag, z_hn.imag, atol=2e-3)


def test_fit_peaks_two_zarc():
    """Synthetic two-ZARC distribution: recover both peaks."""
    tau = np.logspace(-8, 2, 101)
    x_true = np.array([1.0, np.log(1e-4), 1.0, 0.8,
                       2.0, np.log(1e-1), 1.0, 0.7])
    gamma = np.asarray(evaluate_fit_distribution(x_true, tau))
    Rp = 3.0
    x = fit_peaks(tau, gamma, Rp)
    assert len(x) == 8
    info_t0 = np.sort(np.exp(x[1::4]))
    assert abs(np.log10(info_t0[0] / 1e-4)) < 0.3
    assert abs(np.log10(info_t0[1] / 1e-1)) < 0.3
    R_sorted = x[::4][np.argsort(np.exp(x[1::4]))]
    np.testing.assert_allclose(R_sorted, [1.0, 2.0], rtol=0.15)


def test_constrained_peak_fit():
    tau = np.logspace(-8, 2, 101)
    x_true = np.array([1.0, np.log(1e-4), 1.0, 0.8,
                       2.0, np.log(1e-1), 1.0, 0.7])
    gamma = np.asarray(evaluate_fit_distribution(x_true, tau))
    res = constrained_peak_fit(tau, gamma, [2e-4, 5e-2], 3.0, nonneg=True)
    t0 = np.sort(np.exp(res["x"][1::4]))
    assert abs(np.log10(t0[0] / 1e-4)) < 0.5
    assert abs(np.log10(t0[1] / 1e-1)) < 0.5


def test_inverter_peak_fit_workflow():
    df = pd.read_csv("/root/reference/data/simulated/Z_2ZARC_Macdonald_0.25.csv")
    freq = df["Freq"].values
    Z = df["Zreal"].values + 1j * df["Zimag"].values
    inv = Inverter()
    # MAP fit resolves the two closely-spaced ZARC peaks (truth: tau ~1.1e-3
    # and ~9.4e-3) better than the over-smoothed ridge recovery
    inv.fit(freq, Z, random_seed=0)
    inv.fit_peaks()
    info = inv.extract_peak_info()
    assert info["num_peaks"] >= 1
    # the dominant peaks must cover the truth's tau range and total R ~ 2
    assert abs(np.sum(info["R"]) - 2.0) < 0.3
    t_main = info["tau_0"][np.argmax(np.abs(info["R"]))]
    assert 1e-4 < t_main < 1e-1
    # peak model reproduces the recovered distribution and the impedance
    g_peaks = inv.predict_peak_distribution(eval_tau=inv.distributions["DRT"]["tau"])
    g_drt = inv.predict_distribution()
    assert np.max(np.abs(g_peaks - g_drt)) < 0.3 * np.max(g_drt)
    z_peaks = inv.predict_peak_Z(freq)
    assert np.median(np.abs(z_peaks - Z) / np.abs(Z)) < 0.05


def test_reference_parity_helpers():
    """The small reference-parity helpers: peak_fit_residuals is the
    residual the LM solver actually minimizes (peak_fit.py:68-73);
    is_number / camel_case_split mirror utils.py:79-90."""
    from bayes_drt_tpu.peaks import peak_fit_residuals
    from bayes_drt_tpu.utils import camel_case_split, is_number

    tau = np.logspace(-3, 1, 30)
    x = np.array([0.8, np.log(0.05), 0.95, 0.85])
    gamma = np.zeros(30)
    r = np.asarray(peak_fit_residuals(x, tau, gamma, 1.0, np.ones(30),
                                      0.5, 0.01))
    assert r.shape == (30 + 1 + 1 + 1,)
    # penalty terms match the reference formulas
    np.testing.assert_allclose(r[30], np.sqrt(np.abs(0.8)) * 0.5)
    np.testing.assert_allclose(r[31], 0.8 * 0.01)
    np.testing.assert_allclose(r[32], 2 * (0.8 - 1.0))

    assert is_number("3.5") and is_number("-1e10")
    assert not is_number("abc") and not is_number(None)
    assert camel_case_split("BimodalTPDDt") == ["Bimodal", "TPD", "Dt"]
    assert camel_case_split("ZarcRL") == ["Zarc", "RL"]
