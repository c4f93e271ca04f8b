"""Broad regression against the reference's committed fit outputs: MAP fits
across several simulated circuits must recover distributions as well as the
reference's committed results (code_EchemActa/map_results/Gout_*.csv)."""

import numpy as np
import pandas as pd
import pytest

import jax

from bayes_drt_tpu import Inverter

CASES = [
    # (spectrum file, truth gamma file, committed MAP result)
    ("Z_2ZARC_uniform_0.25.csv", "gamma_2ZARC.csv",
     "Gout_2ZARC_uniform_0.25.csv"),
    ("Z_Gerischer_uniform_0.25.csv", "gamma_Gerischer.csv",
     "Gout_Gerischer_uniform_0.25.csv"),
    ("Z_ZARC-RL_uniform_0.25.csv", "gamma_ZARC-RL.csv",
     "Gout_ZARC-RL_uniform_0.25.csv"),
]


@pytest.mark.parametrize("z_file,gamma_file,ref_file", CASES)
def test_map_regression_vs_reference(z_file, gamma_file, ref_file):
    df = pd.read_csv(f"/root/reference/data/simulated/{z_file}")
    freq = df["Freq"].values
    Z = df["Zreal"].values + 1j * df["Zimag"].values

    inv = Inverter()
    inv.fit(freq, Z, random_seed=0, n_restarts=3, check_outliers=False)

    ref = pd.read_csv(f"/root/reference/code_EchemActa/map_results/{ref_file}")
    gamma = inv.predict_distribution("DRT", eval_tau=ref["tau"].values)
    gt = pd.read_csv(f"/root/reference/data/simulated/{gamma_file}")

    rp = max(abs(np.trapezoid(gt["gamma"].values, np.log(gt["tau"].values))),
             np.max(np.abs(gt["gamma"].values)))
    # our recovery must track the reference's committed recovery
    rmse_ref = np.sqrt(np.mean((gamma - ref["gamma"].values) ** 2))
    # and the reference's own recovery error sets the accuracy yardstick
    gamma_gt = inv.predict_distribution("DRT", eval_tau=gt["tau"].values)
    rmse_truth = np.sqrt(np.mean((gamma_gt - gt["gamma"].values) ** 2))
    ref_on_gt = np.interp(np.log(gt["tau"].values), np.log(ref["tau"].values),
                          ref["gamma"].values)
    rmse_ref_truth = np.sqrt(np.mean((ref_on_gt - gt["gamma"].values) ** 2))

    assert rmse_ref < 0.15 * rp, (z_file, rmse_ref, rp)
    # no worse than 1.5x the reference's own recovery error (plus floor)
    assert rmse_truth < 1.5 * rmse_ref_truth + 0.02 * rp, (
        z_file, rmse_truth, rmse_ref_truth)

    z_hat = inv.predict_Z(freq)
    assert np.median(np.abs(z_hat - Z) / np.abs(Z)) < 0.01


def test_scaling_roundtrip():
    """_scale_Z / _rescale_coef invariants (SURVEY.md section 4 unit list)."""
    inv = Inverter()
    rng = np.random.default_rng(0)
    Z = rng.standard_normal(81) + 1j * rng.standard_normal(81) + 5.0
    Zs = inv._scale_Z(Z, "map")
    np.testing.assert_allclose(Zs * inv._Z_scale, Z)
    np.testing.assert_allclose(np.std(np.abs(Zs)), np.sqrt(81 / 81), rtol=1e-10)
    coef = rng.standard_normal(10)
    np.testing.assert_allclose(
        inv._rescale_coef(coef, "series") / inv._Z_scale, coef)
    np.testing.assert_allclose(
        inv._rescale_coef(coef, "parallel") * inv._Z_scale, coef)


def test_weight_formatting():
    """_format_weights schemes (reference: inversion.py:2338-2395)."""
    inv = Inverter()
    freq = np.logspace(3, -1, 10)
    Z = (1 + 1j) * np.linspace(1, 2, 10)
    w = inv._format_weights(freq, Z, None, "both")
    np.testing.assert_allclose(w, np.ones(10) * (1 + 1j))
    w = inv._format_weights(freq, Z, "modulus", "both")
    np.testing.assert_allclose(np.real(w), 1 / np.abs(Z))
    w = inv._format_weights(freq, Z, "proportional", "both")
    np.testing.assert_allclose(np.real(w), 1 / np.abs(Z.real))
    np.testing.assert_allclose(np.imag(w), 1 / np.abs(Z.imag))
    w = inv._format_weights(freq, Z, 2.0, "real")
    np.testing.assert_allclose(np.imag(w), np.ones(10))
    with pytest.raises(ValueError):
        inv._format_weights(freq, Z, "bogus", "both")
    with pytest.raises(ValueError):
        inv._format_weights(freq, Z, None, "bogus")


def test_extrapolation_beyond_measurement_range():
    """Tutorial 2 workload: fit a truncated spectrum, predict beyond it."""
    df = pd.read_csv("/root/reference/data/simulated/Z_ZARC_Macdonald_0.25.csv")
    freq = df["Freq"].values
    Z = df["Zreal"].values + 1j * df["Zimag"].values
    # truncate the low-frequency tail (keep f >= 1 Hz)
    keep = freq >= 1.0
    inv = Inverter()
    inv.fit(freq[keep], Z[keep], random_seed=0, check_outliers=False)
    # predict over the FULL range including the unmeasured decade
    z_full = inv.predict_Z(freq)
    # extrapolated low-frequency points should still be within ~10%
    lo = ~keep
    rel = np.abs(z_full[np.argsort(freq)[::-1]] - Z[np.argsort(freq)[::-1]])
    z_sorted = Z[np.argsort(freq)[::-1]]
    rel = rel / np.abs(z_sorted)
    f_sorted = freq[np.argsort(freq)[::-1]]
    assert np.median(rel[f_sorted < 1.0]) < 0.1
