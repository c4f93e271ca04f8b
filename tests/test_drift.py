"""Drift (time-evolving spectrum) MAP fits on synthetic drifting data."""

import numpy as np
import pytest

from bayes_drt_tpu import Inverter


def make_drifting_spectrum(model="RQ", seed=0):
    """ZARC + growing second ZARC, measured over THREE consecutive frequency
    sweeps (drift is only identifiable when the same frequency is revisited
    at different times; a single sweep confounds drift with a static
    frequency response)."""
    rng = np.random.default_rng(seed)
    base_freq = np.logspace(5, -1, 31)
    freq = np.tile(base_freq, 3)
    times = np.linspace(0, 3 * 1800.0, len(freq))   # three 30-minute sweeps
    omega = 2 * np.pi * freq
    z_static = 1.0 + 1.0 / (1 + (1j * omega * 1e-3) ** 0.85)
    if model.startswith("RQ"):
        k_d = 1.0 / 600.0
        f_t = 1 - np.exp(-k_d * times)
        z_drift = f_t * (0.5 / (1 + (1j * omega * 0.05) ** 0.9))
    else:
        f_t = 1 - np.exp(-times / 600.0)
        z_drift = f_t * (0.5 / (1 + (1j * omega * 0.05) ** 0.9))
    Z = z_static + z_drift
    Z = Z + 0.001 * (rng.standard_normal(len(Z)) + 1j * rng.standard_normal(len(Z)))
    return freq, Z, times


def test_drift_rq_fit():
    freq, Z, times = make_drifting_spectrum("RQ")
    inv = Inverter()
    inv.drift_map_fit(freq, Z, times, drift_model="RQ", random_seed=0,
                      n_restarts=2)
    assert inv.fit_type == "map-drift"
    fits = inv.distribution_fits["DRT"]
    # recovered drifting ZARC parameters
    assert abs(np.log10(fits["tau_rq"] / 0.05)) < 1.0, fits["tau_rq"]
    assert 0.2 < fits["R_rq"] < 1.0, fits["R_rq"]
    # prediction at the measurement times reproduces the data
    z_hat = inv.predict_Z_drift(freq, times)
    assert np.median(np.abs(z_hat - Z) / np.abs(Z)) < 0.05
    # distribution evolves over time: more low-frequency mass at t=1800
    tau_eval = np.logspace(-6, 1, 100)
    g0 = inv.predict_distribution_drift(0.0, eval_tau=tau_eval)
    g1 = inv.predict_distribution_drift(1800.0, eval_tau=tau_eval)
    slow = tau_eval > 1e-2
    assert np.trapezoid(g1[slow], np.log(tau_eval[slow])) > \
        np.trapezoid(g0[slow], np.log(tau_eval[slow]))


def test_drift_x1_fit():
    freq, Z, times = make_drifting_spectrum("x1")
    inv = Inverter()
    inv.drift_map_fit(freq, Z, times, drift_model="x1", random_seed=0,
                      n_restarts=2, min_tau_drift=100.0)
    z_hat = inv.predict_Z_drift(freq, times)
    assert np.median(np.abs(z_hat - Z) / np.abs(Z)) < 0.05
    fits = inv.distribution_fits["DRT"]
    assert "x0" in fits and "x1" in fits and "tau_x1" in fits


def test_drift_invalid_model():
    freq, Z, times = make_drifting_spectrum()
    inv = Inverter()
    with pytest.raises(ValueError):
        inv.drift_map_fit(freq, Z, times, drift_model="bogus")
    with pytest.raises(ValueError):
        inv.drift_map_fit(freq, Z, times[:-2], drift_model="RQ")
