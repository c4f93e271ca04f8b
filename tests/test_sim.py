"""The simulation module must reproduce the reference's committed noiseless
datasets exactly (they were generated from the same circuit definitions)."""

import numpy as np
import pandas as pd
import pytest

from bayes_drt_tpu import sim

SIM = "/root/reference/data/simulated"


@pytest.mark.parametrize("name", ["RC", "ZARC", "2RC", "2ZARC", "ZARC-RL",
                                  "RC-ZARC", "Gerischer"])
def test_reference_circuits_match_committed_noiseless(name):
    df = pd.read_csv(f"{SIM}/Z_{name}_noiseless.csv")
    freq = df["Freq"].values
    Z = sim.reference_circuit(name, freq)
    np.testing.assert_allclose(Z.real, df["Zreal"].values, rtol=1e-6,
                               atol=1e-9)
    np.testing.assert_allclose(Z.imag, df["Zimag"].values, rtol=1e-6,
                               atol=1e-9)


@pytest.mark.parametrize("name", ["ZARC", "2ZARC", "ZARC-RL", "RC-ZARC"])
def test_reference_gammas_match_committed(name):
    gt = pd.read_csv(f"{SIM}/gamma_{name}.csv")
    g = sim.reference_gamma(name, gt["tau"].values)
    np.testing.assert_allclose(g, gt["gamma"].values, rtol=1e-8, atol=1e-12)


def test_noise_models_reproducible_and_scaled():
    freq = np.logspace(5, -1, 40)
    Z = sim.reference_circuit("ZARC", freq)
    z1, sr, si = sim.add_simple_noise(Z, 123, 0.01, "uniform")
    z2, _, _ = sim.add_simple_noise(Z, 123, 0.01, "uniform")
    np.testing.assert_array_equal(z1, z2)
    assert np.std((z1 - Z).real) == pytest.approx(0.01, rel=0.5)

    zo, sr, si = sim.add_model_noise(Z, 7, 0.01, 0.01, "Orazem")
    np.testing.assert_allclose(sr, 0.01 * np.abs(Z.real) + 0.01 * np.abs(Z.imag))
    zm, sr, si = sim.add_model_noise(Z, 7, 0.005, 0.01, "Macdonald")
    np.testing.assert_allclose(sr, 0.005 + 0.01 * np.abs(Z.real))


def test_ddt_cole_cole_matches_committed_tp():
    """The DRT-2-TpDDT noiseless dataset = ZARC(tau=1e-2) circuit + TP-DDT
    with Cole-Cole distribution (t0=0.1, phi=0.8)."""
    df = pd.read_csv(f"{SIM}/Z_DRT-2-TpDDT_noiseless.csv")
    freq = df["Freq"].values
    Z = (1 + sim.z_zarc(freq, 1, 1e-2, 0.8)
         + sim.z_ddt_cole_cole(freq, 0.1, 0.8, bc="transmissive"))
    np.testing.assert_allclose(Z.real, df["Zreal"].values, rtol=1e-3)
    np.testing.assert_allclose(Z.imag, df["Zimag"].values, rtol=1e-3,
                               atol=1e-4)


def test_benchmark_batch():
    freq, Zb = sim.make_benchmark_batch(8, circuit="2ZARC", seed=1)
    assert Zb.shape == (8, 81)
    # replicas differ by noise only
    assert not np.allclose(Zb[0], Zb[1])
    assert np.max(np.abs(Zb - Zb.mean(axis=0))) < 0.2
