"""End-to-end CLI test: instrument files in, Gout_*.csv results out
(the reference's paper batch workflow, code_EchemActa/"Run fits.ipynb",
as one command)."""

import numpy as np
import pandas as pd
import pytest

from bayes_drt_tpu import sim
from bayes_drt_tpu.cli import main


@pytest.fixture(scope="module")
def data_dir(tmp_path_factory):
    """Four simulated ZARC spectra on TWO frequency grids (so the CLI must
    bucket), written as plain CSVs the loader understands."""
    d = tmp_path_factory.mktemp("spectra")
    rng = np.random.default_rng(0)
    grids = [np.logspace(6, -2, 65), np.logspace(5, -1, 49)]
    for i in range(4):
        freq = grids[i % 2]
        Z = sim.reference_circuit("ZARC", freq)
        Z = Z + 0.002 * (rng.standard_normal(len(Z))
                         + 1j * rng.standard_normal(len(Z)))
        pd.DataFrame({"Freq": freq, "Zreal": Z.real, "Zimag": Z.imag,
                      "Extra": np.arange(len(freq))}).to_csv(
            d / f"spec_{i}.csv", index=False)
    return d


def _ground_truth():
    gt = pd.read_csv("/root/reference/data/simulated/gamma_ZARC.csv")
    rp = np.trapezoid(gt["gamma"].values, np.log(gt["tau"].values))
    return gt, rp


def test_cli_ridge_directory(data_dir, tmp_path):
    out = tmp_path / "out"
    rc = main(["fit", str(data_dir), "--pattern", "*.csv",
               "--out", str(out), "--mode", "ridge"])
    assert rc == 0
    summary = pd.read_csv(out / "summary.csv")
    assert len(summary) == 4
    _, rp = _ground_truth()
    # hyper-lambda ridge recovers Rp well even at this short budget
    assert np.allclose(summary["Rp"], rp, rtol=0.15), summary["Rp"].values
    for i in range(4):
        g = pd.read_csv(out / f"Gout_spec_{i}.csv")
        assert list(g.columns) == ["tau", "gamma"]
        assert np.isfinite(g.values).all()


def test_cli_sample_writes_credible_bands(data_dir, tmp_path):
    out = tmp_path / "out_hmc"
    rc = main(["fit", str(data_dir / "spec_0.csv"), str(data_dir / "spec_2.csv"),
               "--out", str(out), "--mode", "sample",
               "--chains", "2", "--warmup", "80", "--samples", "80",
               "--seed", "3"])
    assert rc == 0
    summary = pd.read_csv(out / "summary.csv")
    assert len(summary) == 2
    assert {"min_ess", "logp_split_rhat", "divergence_rate"} <= set(summary)
    g = pd.read_csv(out / "Gout_spec_0.csv")
    assert list(g.columns) == ["tau", "gamma", "gamma_lo", "gamma_hi"]
    assert (g["gamma_lo"] <= g["gamma_hi"]).all()
    # bands bracket the point estimate
    assert (g["gamma"] >= g["gamma_lo"] - 1e-9).all()
    assert (g["gamma"] <= g["gamma_hi"] + 1e-9).all()
    gt, rp = _ground_truth()
    gi = np.interp(gt["tau"].values, g["tau"].values, g["gamma"].values)
    rmse = np.sqrt(np.mean((gi - gt["gamma"].values) ** 2))
    assert rmse < 0.10 * rp, rmse


def test_cli_optimize_single_file(data_dir, tmp_path):
    out = tmp_path / "out_map"
    rc = main(["fit", str(data_dir / "spec_1.csv"), "--out", str(out),
               "--mode", "optimize", "--max-iter", "800"])
    assert rc == 0
    gt, rp = _ground_truth()
    g = pd.read_csv(out / "Gout_spec_1.csv")
    gi = np.interp(gt["tau"].values, g["tau"].values, g["gamma"].values)
    rmse = np.sqrt(np.mean((gi - gt["gamma"].values) ** 2))
    assert rmse < 0.05 * rp, rmse


def test_cli_no_match(tmp_path):
    assert main(["fit", str(tmp_path), "--pattern", "*.nope"]) == 2
