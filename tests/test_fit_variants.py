"""Coverage for the remaining fit variants: fitY, generic MultiDist,
part='real'/'imag' likelihood masks."""

import numpy as np
import pandas as pd
import pytest

from bayes_drt_tpu import Inverter
from bayes_drt_tpu.models.posterior import PosteriorConfig, DistConfig


def load(name):
    df = pd.read_csv(f"/root/reference/data/simulated/{name}")
    return df["Freq"].values, df["Zreal"].values + 1j * df["Zimag"].values


def test_fitY_admittance_fit():
    freq, Z = load("Z_BimodalTP-DDT_uniform_0.05.csv")
    inv = Inverter(distributions={
        "DDT": {"kernel": "DDT", "symmetry": "planar", "bc": "transmissive",
                "dist_type": "parallel",
                "basis_freq": np.logspace(6, -3, 91)}})
    inv.fit(freq, Z, fitY=True, random_seed=0, n_restarts=2)
    assert inv.stan_model_name == "Parallel_fitY"
    assert inv.R_inf == 0 and inv.inductance == 0
    # fitY fits the admittance directly: Y_hat = A x must track Y = 1/Z
    order = np.argsort(freq)[::-1]
    f_s, Y_s = freq[order], (1.0 / Z)[order]
    mat = inv._get_prediction_matrices(f_s, ["DDT"])["DDT"]
    coef = inv.distribution_fits["DDT"]["coef"]
    y_hat = mat["A_re"] @ coef + 1j * (mat["A_im"] @ coef)
    rel = np.abs(y_hat - Y_s) / np.abs(Y_s)
    assert np.median(rel) < 0.05, np.median(rel)


def test_fitY_requires_parallel():
    freq, Z = load("Z_ZARC_Macdonald_0.25.csv")
    inv = Inverter()
    with pytest.raises(ValueError):
        inv.fit(freq, Z, fitY=True)


def test_multidist_model_name():
    # 2 series + 1 parallel -> MultiDist generalization
    cfg = PosteriorConfig(dists=(
        DistConfig("a", "series", "DRT", 10),
        DistConfig("b", "series", "DDT", 10),
        DistConfig("c", "parallel", "DDT", 10)))
    assert cfg.model_name() == "MultiDist"
    cfg2 = PosteriorConfig(dists=(DistConfig("a", "series", "DRT", 10),
                                  DistConfig("c", "parallel", "DDT", 10)))
    assert cfg2.model_name() == "Series-Parallel"


def test_multidist_two_series_fit():
    """Two series distributions (DRT + series DDT) exercise the MultiDist
    generalization end-to-end (the reference notes MultiDist accuracy is
    'suboptimal', inversion.py:1588-1590; additive series pairs are the
    well-conditioned case)."""
    freq, Z = load("Z_ZARC_Macdonald_0.25.csv")
    inv = Inverter(distributions={
        "DRT": {"kernel": "DRT"},
        "S-DDT": {"kernel": "DDT", "dist_type": "series", "symmetry": "planar",
                  "bc": "transmissive"},
    })
    inv.fit(freq, Z, nonneg=True, random_seed=0, n_restarts=3, max_iter=1500,
            check_outliers=False)
    assert inv.stan_model_name.startswith("MultiDist")
    assert set(inv.distribution_fits) == {"DRT", "S-DDT"}
    z_hat = inv.predict_Z(freq)
    assert np.median(np.abs(z_hat - Z) / np.abs(Z)) < 0.05


def test_part_real_imag_fit():
    freq, Z = load("Z_ZARC_Macdonald_0.25.csv")
    inv = Inverter()
    inv.fit(freq, Z, part="imag", random_seed=0, n_restarts=2,
            check_outliers=False)
    z_hat = inv.predict_Z(freq)
    # imag part should be well fit even though real part was masked
    idx = np.argsort(freq)[::-1]
    rel_im = np.abs(z_hat.imag[np.argsort(np.argsort(freq)[::-1])] - Z.imag)
    assert np.isfinite(z_hat).all()
