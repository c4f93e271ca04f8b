import numpy as np
import pandas as pd
import pytest

from bayes_drt_tpu import sim
from bayes_drt_tpu.ecm import ecm_impedance, estimate_hfr, fit_ecm


def test_fit_ecm_recovers_2zarc():
    freq = np.logspace(6, -2, 81)
    Z = sim.reference_circuit("2ZARC", freq)
    rng = np.random.default_rng(0)
    Zn = Z + 0.002 * (rng.standard_normal(81) + 1j * rng.standard_normal(81))
    circuit = [("R", {"R": 0.5}),
               ("ZARC", {"R": 0.5, "tau": 3e-3, "phi": 0.7}),
               ("ZARC", {"R": 0.5, "tau": 3e-2, "phi": 0.7})]
    res = fit_ecm(freq, Zn, circuit)
    params = {i: p for i, (n, p) in enumerate(res["circuit"])}
    assert abs(params[0]["R"] - 1.0) < 0.05
    taus = sorted([params[1]["tau"], params[2]["tau"]])
    assert abs(np.log10(taus[0] / 1e-3)) < 0.2
    assert abs(np.log10(taus[1] / 1e-2)) < 0.2
    for i in (1, 2):
        assert abs(params[i]["phi"] - 0.8) < 0.05
        assert abs(params[i]["R"] - 1.0) < 0.1
    assert res["chi_sq"] < 1e-4


def test_fit_ecm_gerischer():
    freq = np.logspace(5, -1, 61)
    Z = sim.reference_circuit("Gerischer", freq)
    circuit = [("R", {"R": 0.5}), ("Gerischer", {"R": 0.5, "tau": 1e-3})]
    res = fit_ecm(freq, Z, circuit)
    params = dict(res["circuit"])
    assert abs(params["Gerischer"]["tau"] - 1e-2) / 1e-2 < 0.1
    assert abs(params["R"]["R"] - 1.0) < 0.02


def test_ecm_impedance_matches_sim():
    freq = np.logspace(4, -1, 20)
    z1 = np.asarray(ecm_impedance([("ZARC", {"R": 2.0, "tau": 1e-3, "phi": 0.8})], freq))
    z2 = sim.z_zarc(freq, 2.0, 1e-3, 0.8)
    np.testing.assert_allclose(z1, z2, rtol=1e-10)


def test_estimate_hfr():
    freq = np.logspace(6, -2, 81)
    Z = sim.reference_circuit("ZARC", freq) + 1j * 2 * np.pi * freq * 1e-7
    # inductance pushes Z'' positive at high f -> crossing near R_inf = 1
    assert abs(estimate_hfr(freq, Z) - 1.0) < 0.05
