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


def test_cli_ridge_cv(data_dir, tmp_path):
    out = tmp_path / "out_cv"
    rc = main(["fit", str(data_dir / "spec_0.csv"), "--out", str(out),
               "--mode", "ridge", "--ridge-cv", "--cv-grid", "1e-5,1,5"])
    assert rc == 0
    summary = pd.read_csv(out / "summary.csv")
    lam = float(summary["cv_lambda"].iloc[0])
    # the CLI rebuilds the grid via log10 of the parsed endpoints, which
    # lands an ulp off exact logspace values — compare with tolerance
    assert np.isclose(lam, np.logspace(-5, 0, 5), rtol=1e-10).any(), lam
    gt, rp = _ground_truth()
    g = pd.read_csv(out / f"Gout_spec_0.csv")
    gi = np.interp(gt["tau"].values, g["tau"].values, g["gamma"].values)
    rmse = np.sqrt(np.mean((gi - gt["gamma"].values) ** 2))
    assert rmse < 0.10 * rp, rmse


def test_cli_ridge_outliers(data_dir, tmp_path):
    out = tmp_path / "out_hw"
    rc = main(["fit", str(data_dir / "spec_0.csv"), "--out", str(out),
               "--mode", "ridge", "--outliers"])
    assert rc == 0
    gt, rp = _ground_truth()
    g = pd.read_csv(out / "Gout_spec_0.csv")
    gi = np.interp(gt["tau"].values, g["tau"].values, g["gamma"].values)
    rmse = np.sqrt(np.mean((gi - gt["gamma"].values) ** 2))
    assert rmse < 0.20 * rp, rmse
    # --ridge-cv and --outliers are mutually exclusive in ridge mode
    assert main(["fit", str(data_dir / "spec_0.csv"), "--out", str(out),
                 "--mode", "ridge", "--outliers", "--ridge-cv"]) == 2


def test_cli_no_match(tmp_path):
    assert main(["fit", str(tmp_path), "--pattern", "*.nope"]) == 2


def test_cli_skips_unparseable_file(data_dir, tmp_path):
    bad = tmp_path / "corrupt.csv"
    bad.write_text("this is not a spectrum\x00\x01")
    out = tmp_path / "out_skip"
    rc = main(["fit", str(data_dir / "spec_0.csv"), str(bad),
               "--out", str(out), "--mode", "ridge"])
    assert rc == 0
    summary = pd.read_csv(out / "summary.csv")
    assert len(summary) == 2
    bad_row = summary[summary["file"] == "corrupt.csv"]
    assert bad_row["status"].iloc[0].startswith("load_error")
    ok = summary[summary["file"] == "spec_0.csv"]
    assert ok["status"].iloc[0] == "ok"
    # reconstruction-quality column present and tight on the good fit
    assert float(ok["median_rel_resid"].iloc[0]) < 0.02


def test_cli_peak_fitting(data_dir, tmp_path):
    out = tmp_path / "out_peaks"
    rc = main(["fit", str(data_dir / "spec_0.csv"), "--out", str(out),
               "--mode", "ridge", "--peaks"])
    assert rc == 0
    summary = pd.read_csv(out / "summary.csv")
    assert int(summary["n_peaks"].iloc[0]) >= 1
    assert float(summary["peak_fit_rmse_rel"].iloc[0]) < 0.15
    peaks = pd.read_csv(out / "Peaks_spec_0.csv")
    assert list(peaks.columns) == ["R", "tau0", "alpha", "beta"]
    # the ZARC's dominant peak: tau0 near 1e-3 s, R near Rp=1
    top = peaks.iloc[peaks["R"].abs().idxmax()]
    assert 0.6 < top["R"] < 1.4
    assert 1e-4 < top["tau0"] < 1e-2
