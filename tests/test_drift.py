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
                      n_restarts=8)
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


def test_drift_x1_parameter_recovery():
    """Well-identified x1 case (strong drift, low noise, four sweeps,
    committed seed): the fitted drift time constant and the endpoint
    polarization resistances must match truth, and the user-facing numpy
    predict path must agree with an independent reimplementation of the
    documented forward model (reference: inversion.py:1442-1551, 2746-2940).
    Drift basins are multimodal in general (CLAUDE.md), so this pins the
    one configuration where truth IS recoverable."""
    rng = np.random.default_rng(7)
    base_freq = np.logspace(5, -1, 25)
    freq = np.tile(base_freq, 4)
    times = np.linspace(0.0, 4 * 1800.0, len(freq))
    tau_d, r0, r1 = 1500.0, 0.6, 1.4
    omega = 2 * np.pi * freq
    r_t = r0 + (r1 - r0) * (1 - np.exp(-times / tau_d))
    Z = 1.0 + r_t / (1 + (1j * omega * 1e-3) ** 0.85)
    Z = Z + 0.0005 * (rng.standard_normal(len(Z))
                      + 1j * rng.standard_normal(len(Z)))

    inv = Inverter()
    inv.drift_map_fit(freq, Z, times, drift_model="x1", random_seed=0,
                      n_restarts=4)
    fits = inv.distribution_fits["DRT"]
    # drift time constant: recovered within 1.5x (measured: 1496 vs 1500)
    assert 1 / 1.5 < fits["tau_x1"] / tau_d < 1.5, fits["tau_x1"]
    # endpoint polarization resistances (t=0 and t->inf distributions)
    tau_eval = np.logspace(-7, 2, 200)
    g0 = inv.predict_distribution_drift(0.0, eval_tau=tau_eval)
    g_inf = inv.predict_distribution_drift(1e7, eval_tau=tau_eval)
    rp0 = np.trapezoid(g0, np.log(tau_eval))
    rp1 = np.trapezoid(g_inf, np.log(tau_eval))
    assert abs(rp0 - r0) < 0.08, rp0
    assert abs(rp1 - r1) < 0.08, rp1
    assert abs(inv.drift_offsets["Rinf_0"] - 1.0) < 0.05

    # independent numpy reimplementation of the x1 predict path:
    # X(t) = x0 + (x1 - x0)(1 - e^{-t/tau}), Z = A@X row-wise
    # + Rinf(t) + jwL, from PUBLIC fit attributes only
    pm = inv._get_prediction_matrices(freq, ["DRT"])["DRT"]
    decay = 1 - np.exp(-times / fits["tau_x1"])
    x_t = fits["x0"][None, :] + (fits["x1"] - fits["x0"])[None, :] * decay[:, None]
    rinf_t = (inv.drift_offsets["Rinf_0"] + inv.drift_offsets["delta_Rinf"]
              * (1 - np.exp(-times / inv.drift_offsets["tau_Rinf"])))
    z_manual = (np.sum(pm["A_re"] * x_t, axis=1)
                + 1j * np.sum(pm["A_im"] * x_t, axis=1)
                + rinf_t + 1j * omega * inv.inductance)
    z_api = inv.predict_Z_drift(freq, times)
    np.testing.assert_allclose(z_api, z_manual, rtol=1e-10, atol=1e-12)


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


def test_drift_time_routing_through_generic_api():
    """The generic predictors route times/time to the drift paths
    (reference: inversion.py:2746-2940, 3173-3296): predict_Z(times=...),
    predict_distribution(time=...), fit_peaks(time=...), score(times=...)
    and predict_sigma(times=...) all work on a map-drift fit, and the time
    argument is rejected for non-drift fits."""
    freq, Z, times = make_drifting_spectrum("RQ")
    inv = Inverter()
    inv.drift_map_fit(freq, Z, times, drift_model="RQ", random_seed=0,
                      n_restarts=8)

    # predict_Z routes to the drift path and matches predict_Z_drift
    z_generic = inv.predict_Z(freq, times=times)
    np.testing.assert_allclose(z_generic, inv.predict_Z_drift(freq, times))
    # ...and refuses to silently ignore a missing times argument
    with pytest.raises(ValueError, match="requires times"):
        inv.predict_Z(freq)

    # predict_distribution routes time
    tau_eval = np.logspace(-6, 1, 50)
    g = inv.predict_distribution("DRT", eval_tau=tau_eval, time=1800.0)
    np.testing.assert_allclose(
        g, inv.predict_distribution_drift(1800.0, eval_tau=tau_eval))

    # fit_peaks decomposes the time-t distribution (routing smoke), and
    # the drifting ZARC (tau ~ 0.05, R = 0.5, k_d = 1/600 -> 95% by
    # t=1800 s) must appear as GROWTH of distribution mass near its time
    # constant between t=0 and t=1800 — measured on the distribution
    # itself (the HN peak-window split is fragile under optimizer basin
    # changes; the integral is not)
    inv.fit_peaks(time=1800.0)
    assert inv.distribution_fits["DRT"]["peak_params"].size % 4 == 0

    tau_win = np.logspace(np.log10(0.05) - 1, np.log10(0.05) + 1, 101)

    def slow_mass(t):
        gam = inv.predict_distribution("DRT", eval_tau=tau_win, time=t)
        return np.trapezoid(gam, np.log(tau_win))
    r_rq = inv.distribution_fits["DRT"]["R_rq"]
    m_late, m_early = slow_mass(1800.0), slow_mass(0.0)
    assert m_late > m_early + 0.25 * r_rq, (m_early, m_late, r_rq)

    # score and predict_sigma accept times
    chi_sq = inv.score(freq, Z, times=times)
    assert np.isfinite(chi_sq) and chi_sq < 10.0
    s_re, s_im = inv.predict_sigma(freq, times=times)
    assert np.isfinite(s_re).all() and np.isfinite(s_im).all()

    # non-drift fits reject the time arguments
    inv2 = Inverter()
    base = np.logspace(5, -1, 31)
    omega = 2 * np.pi * base
    z_static = 1.0 + 1.0 / (1 + (1j * omega * 1e-3) ** 0.85)
    inv2.fit(base, z_static, random_seed=0, n_restarts=2)
    with pytest.raises(ValueError, match="only valid for drift"):
        inv2.predict_Z(base, times=np.zeros(len(base)))
    with pytest.raises(ValueError, match="only valid for drift"):
        inv2.predict_distribution("DRT", time=0.0)
    with pytest.raises(ValueError, match="only valid for drift"):
        inv2.predict_sigma(base, times=np.zeros(len(base)))
