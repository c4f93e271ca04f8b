"""Round-5 additions: batched posterior-predictive impedance
(predict_Z_batch — the batched analogue of the reference's predict_Z /
Stan Z_hat_tilde generated quantities, Series_modelcode.txt:70-73) and
sigma_min plumbing through the batch APIs (reference fit(sigma_min=...),
inversion.py:1116-1119)."""

import numpy as np
import pandas as pd
import pytest

from bayes_drt_tpu import Inverter
from bayes_drt_tpu.parallel import (evaluate_gamma, fit_spectra_batch,
                                    predict_Z_batch)


def _load(name):
    df = pd.read_csv(f"/root/reference/data/simulated/{name}")
    return df["Freq"].values, df["Zreal"].values + 1j * df["Zimag"].values


def test_predict_z_batch_single_drt():
    freq, z = _load("Z_ZARC_uniform_1.0.csv")
    zb = np.stack([z, z * 2.0])     # second spectrum scaled: distinct fits
    res = fit_spectra_batch(freq, zb, mode="optimize", max_iter=600,
                            init_from_ridge=True, random_seed=0)
    z_hat = predict_Z_batch(res, freq)
    assert z_hat.shape == zb.shape
    rel = np.abs(z_hat - zb) / np.abs(zb)
    assert np.median(rel, axis=1).max() < 0.02, np.median(rel, axis=1)
    # new-frequency evaluation: finite, and consistent with the training
    # grid where they coincide
    f_new = np.logspace(5, -1, 37)
    z_new = predict_Z_batch(res, f_new)
    assert z_new.shape == (2, 37) and np.isfinite(z_new).all()


def test_predict_z_batch_matches_inverter_multidist():
    """Cross-path proof: a synthetic BatchFitResult carrying an Inverter
    fit's coefficients must predict the SAME impedance as Inverter.predict_Z
    (series + parallel terms, R_inf, inductance)."""
    from bayes_drt_tpu.parallel.batch import BatchFitResult

    freq, z = _load("Z_DRT-2-TpDDT_uniform_0.25.csv")
    bf = np.logspace(5, -1, 31)
    eps_val = 1.0
    dists = {
        "DRT": {"kernel": "DRT", "basis_freq": bf, "epsilon": eps_val},
        "TP-DDT": {"kernel": "DDT", "symmetry": "planar",
                   "bc": "transmissive", "dist_type": "parallel",
                   "basis_freq": bf, "epsilon": eps_val},
    }
    inv = Inverter(distributions=dists)
    inv.fit(freq, z, nonneg=True, random_seed=0, n_restarts=2, max_iter=300)
    tau = 1.0 / (2 * np.pi * bf)
    geometry = tuple(
        {"name": nm, "kernel": d["kernel"], "dist_type":
         d.get("dist_type", "series"), "symmetry": d.get("symmetry", "planar"),
         "bc": d.get("bc", "transmissive"), "ct": False, "k_ct": None,
         "basis": "gaussian", "tau": tau, "epsilon": eps_val}
        for nm, d in (("DRT", dists["DRT"]), ("TP-DDT", dists["TP-DDT"])))
    res = BatchFitResult(
        coef=inv.distribution_fits["DRT"]["coef"][None, :],
        r_inf=np.array([inv.R_inf]), inductance=np.array([inv.inductance]),
        gamma_lo=None, gamma_hi=None, z_scales=np.ones(1), tau=tau,
        epsilon=eps_val,
        diagnostics={"dist_geometry": geometry,
                     "coef_1": inv.distribution_fits["TP-DDT"]["coef"][None, :]})
    f_new = np.logspace(4.5, -0.5, 29)
    z_batch = predict_Z_batch(res, f_new)[0]
    z_inv = inv.predict_Z(f_new)
    np.testing.assert_allclose(z_batch, z_inv, rtol=1e-6, atol=1e-9)


def test_fit_spectra_batch_records_geometry():
    freq, z = _load("Z_BimodalTP-DDT_uniform_0.25.csv")
    dists = {"DDT": {"kernel": "DDT", "symmetry": "planar",
                     "bc": "transmissive", "dist_type": "parallel",
                     "basis_freq": np.logspace(5, -2, 25)}}
    res = fit_spectra_batch(freq, z[None, :], mode="optimize", max_iter=400,
                            n_restarts=1, random_seed=0, distributions=dists)
    (g,) = res.diagnostics["dist_geometry"]
    assert g["kernel"] == "DDT" and g["dist_type"] == "parallel"
    assert g["bc"] == "transmissive" and len(g["tau"]) == 25
    z_hat = predict_Z_batch(res, freq)
    assert np.median(np.abs(z_hat - z) / np.abs(z)) < 0.05


def test_split_manifest_is_total():
    """Every test module must be assigned to exactly one split in BOTH
    tests/SPLITS.md and tests/run_splits.sh (the rig kills any single
    pytest process at ~27 min, so an unassigned module silently never
    runs — see SPLITS.md)."""
    import glob
    import os
    import re

    here = os.path.dirname(__file__)
    modules = sorted(os.path.basename(p)[:-3]
                     for p in glob.glob(os.path.join(here, "test_*.py")))

    md = open(os.path.join(here, "SPLITS.md")).read()
    md_counts = {m: len(re.findall(rf"\b{m}\b(?!\.py)",
                                   md.split("Timing history")[0].split("|--")[-1]))
                 for m in modules}
    sh = open(os.path.join(here, "run_splits.sh")).read()
    sh_counts = {m: sh.count(f"tests/{m}.py") for m in modules}

    missing_md = [m for m, c in md_counts.items() if c == 0]
    dup_md = [m for m, c in md_counts.items() if c > 1]
    bad_sh = [m for m, c in sh_counts.items() if c != 1]
    assert not missing_md, f"modules missing from SPLITS.md table: {missing_md}"
    assert not dup_md, f"modules listed twice in SPLITS.md table: {dup_md}"
    assert not bad_sh, f"modules not exactly once in run_splits.sh: {bad_sh}"


def test_sigma_min_reaches_posterior():
    """sigma_min is the error-scale floor (reference: inversion.py:1116-1119);
    an absurdly large floor must visibly loosen the fit."""
    from bayes_drt_tpu.parallel.batch import _build_shared

    freq, z = _load("Z_ZARC_uniform_1.0.csv")
    *_, data, _ = _build_shared(freq, sigma_min=0.005)
    assert float(data.sigma_min) == pytest.approx(0.005)

    zb = z[None, :]
    res_tight = fit_spectra_batch(freq, zb, mode="optimize", max_iter=500,
                                  n_restarts=1, random_seed=0)
    res_loose = fit_spectra_batch(freq, zb, mode="optimize", max_iter=500,
                                  n_restarts=1, random_seed=0, sigma_min=5.0)
    r_tight = np.median(np.abs(predict_Z_batch(res_tight, freq) - zb)
                        / np.abs(zb))
    r_loose = np.median(np.abs(predict_Z_batch(res_loose, freq) - zb)
                        / np.abs(zb))
    assert r_loose > 3 * r_tight, (r_tight, r_loose)
