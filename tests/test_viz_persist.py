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


def test_nyquist_axis_scale_matching():
    """plot_nyquist matches inches-per-unit across axes by EXPANDING the
    tighter axis, with a zero floor for non-negative data (reference:
    plotting.py:183-253)."""
    import matplotlib.pyplot as plt
    from bayes_drt_tpu.io import construct_eis_df
    from bayes_drt_tpu.viz import plot_nyquist
    # wide flat arc: x range >> y range forces the y-axis expansion branch
    f = np.logspace(5, -1, 40)
    Z = 1.0 + 10.0 / (1 + (1j * f * 1e-3) ** 0.8)
    ax = plot_nyquist(construct_eis_df(f, Z))
    fig = ax.get_figure()
    fig.canvas.draw()
    bbox = ax.get_window_extent().transformed(fig.dpi_scale_trans.inverted())
    xscale = (ax.get_xlim()[1] - ax.get_xlim()[0]) / bbox.width
    yscale = (ax.get_ylim()[1] - ax.get_ylim()[0]) / bbox.height
    assert abs(xscale - yscale) / xscale < 1e-6, (xscale, yscale)
    # data never goes negative -> limits floored at zero
    assert ax.get_xlim()[0] >= 0 and ax.get_ylim()[0] >= 0
    # overlay of a second, larger dataset only ever EXPANDS the view
    xlim0, ylim0 = ax.get_xlim(), ax.get_ylim()
    plot_nyquist(construct_eis_df(f, 2.0 * Z), ax=ax)
    assert ax.get_xlim()[1] >= xlim0[1] and ax.get_ylim()[1] >= ylim0[1]
    assert ax.get_xlim()[0] <= xlim0[0] + 1e-12
    plt.close("all")


def _write_ocv_dta(path, date, time, t_vals, v_vals):
    lines = ["EXPLAIN", "TAG\tCORPOT",
             f"DATE\tLABEL\t{date}\tDate", f"TIME\tLABEL\t{time}\tTime",
             f"CURVE\tTABLE\t{len(t_vals)}",
             "\tT\tVf\tVm", "\ts\tV vs. Ref.\tV"]
    for t, v in zip(t_vals, v_vals):
        lines.append(f"\t{t}\t{v}\t{v}")
    path.write_text("\n".join(lines) + "\n")


def test_plot_ocv_directory_crawl(tmp_path):
    """plot_ocv over a directory overlays every OCV/OCP file on a shared
    time axis anchored at the earliest start (reference: plotting.py:14-57)."""
    import matplotlib.pyplot as plt
    from bayes_drt_tpu.viz import plot_ocv
    _write_ocv_dta(tmp_path / "OCV_a.DTA", "8/31/2020", "10:00:00",
                   [0, 600, 1200], [1.05, 1.06, 1.05])
    _write_ocv_dta(tmp_path / "OCP_b.DTA", "8/31/2020", "12:00:00",
                   [0, 600], [1.04, 1.05])
    _write_ocv_dta(tmp_path / "EIS_c.DTA", "8/31/2020", "11:00:00",
                   [0], [0.0])  # must NOT be picked up by the default filter
    ax = plot_ocv(tmp_path)
    assert len(ax.lines) == 2
    # first file starts at t=0 h; second starts 2 h later
    starts = sorted(line.get_xdata()[0] for line in ax.lines)
    assert abs(starts[0] - 0.0) < 1e-9
    assert abs(starts[1] - 2.0) < 1e-9
    # same_color default: both traces share one color
    assert len({line.get_color() for line in ax.lines}) == 1
    # voltage sign convention: dominant voltage plots positive
    assert max(line.get_ydata().max() for line in ax.lines) > 0
    plt.close("all")
    # files= selection and the mutual-exclusion error
    ax = plot_ocv(tmp_path, files="OCV_a.DTA")
    assert len(ax.lines) == 1
    with pytest.raises(ValueError, match="only one"):
        plot_ocv(tmp_path, files="OCV_a.DTA", filter_func=lambda f: True)
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
