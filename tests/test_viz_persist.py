import os
import matplotlib
matplotlib.use("Agg")

import numpy as np
import pandas as pd
import pytest

from bayes_drt_tpu import Inverter


@pytest.fixture(scope="module")
def fitted_inv():
    df = pd.read_csv("/root/reference/data/simulated/Z_ZARC_Macdonald_0.25.csv")
    freq = df["Freq"].values
    Z = df["Zreal"].values + 1j * df["Zimag"].values
    inv = Inverter()
    inv.fit(freq, Z, random_seed=0)
    return inv, freq, Z


def test_plot_wrappers_render(fitted_inv, tmp_path):
    import matplotlib.pyplot as plt
    inv, freq, Z = fitted_inv
    ax = inv.plot_distribution()
    assert ax is not None
    axes = inv.plot_fit()
    assert len(np.atleast_1d(axes)) == 3
    axes = inv.plot_residuals()
    assert len(axes) == 2
    axes = inv.plot_full_results()
    plt.savefig(tmp_path / "full.png", dpi=50)
    assert (tmp_path / "full.png").stat().st_size > 0
    plt.close("all")


def test_plot_peak_fit(fitted_inv, tmp_path):
    import matplotlib.pyplot as plt
    inv, freq, Z = fitted_inv
    inv.fit_peaks()
    ax = inv.plot_peak_fit()
    assert ax is not None
    plt.close("all")


def test_data_plots_render(tmp_path):
    import matplotlib.pyplot as plt
    from bayes_drt_tpu.viz import plot_eis, plot_nyquist, plot_bode
    df = pd.read_csv("/root/reference/data/simulated/Z_ZARC_Macdonald_0.25.csv")
    plot_nyquist(df)
    plot_bode(df)
    plot_eis(df)
    plt.close("all")


def test_save_load_roundtrip(fitted_inv, tmp_path):
    inv, freq, Z = fitted_inv
    path = str(tmp_path / "fit.pkl")
    inv.save_fit_data(path, which="core")

    inv2 = Inverter()
    inv2.load_fit_data(path)
    assert inv2.fit_type == "map"
    np.testing.assert_allclose(inv2.R_inf, inv.R_inf)
    g1 = inv.predict_distribution()
    g2 = inv2.predict_distribution()
    np.testing.assert_allclose(g1, g2)
    # prediction after load rebuilds matrices
    z1 = inv.predict_Z(freq)
    z2 = inv2.predict_Z(freq)
    np.testing.assert_allclose(z1, z2, rtol=1e-6)


def test_save_load_dict_roundtrip(fitted_inv):
    inv, freq, Z = fitted_inv
    d = inv.save_fit_data(which="all")
    inv2 = Inverter()
    inv2.load_fit_data(d)
    np.testing.assert_allclose(inv2.predict_distribution(),
                               inv.predict_distribution())
