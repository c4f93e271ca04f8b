"""Plotting: Nyquist/Bode/EIS data plots, distribution plots with credible
bands, fit overlays and residual diagnostics (reference:
bayes_drt/plotting.py). Matplotlib, host-side only.
"""

from __future__ import annotations

import matplotlib.pyplot as plt
import numpy as np

from ..utils import get_unit_scale, get_factor_from_unit


def _scaled(df, area):
    f = df["Freq"].values
    z = df["Zreal"].values + 1j * df["Zimag"].values
    if area is not None:
        z = z * area
    return f, z


def plot_nyquist(df, area=None, ax=None, label="", plot_func="scatter",
                 unit_scale="auto", set_aspect_ratio=True, **plt_kw):
    """-Z'' vs Z' with equal axis scaling (reference: plotting.py:112-254)."""
    if ax is None:
        _, ax = plt.subplots(figsize=(4.5, 3.5))
    f, z = _scaled(df, area)
    if unit_scale == "auto":
        unit_scale = get_unit_scale(df, area)
    factor = get_factor_from_unit(unit_scale) if unit_scale else 1.0
    x = z.real / factor
    y = -z.imag / factor
    if plot_func == "scatter":
        ax.scatter(x, y, s=plt_kw.pop("s", 10), label=label, **plt_kw)
    else:
        ax.plot(x, y, label=label, **plt_kw)
    area_str = "$\\cdot \\mathrm{cm}^2$" if area is not None else ""
    ax.set_xlabel(f"$Z^{{\\prime}}$ / {unit_scale}$\\Omega${area_str}")
    ax.set_ylabel(f"$-Z^{{\\prime\\prime}}$ / {unit_scale}$\\Omega${area_str}")
    if label:
        ax.legend()
    if set_aspect_ratio:
        ax.set_aspect("equal", adjustable="datalim")
    return ax


def plot_bode(df, area=None, axes=None, label="", plot_func="scatter",
              cols=None, unit_scale="auto", invert_phase=True, **plt_kw):
    """Bode panels (reference: plotting.py:257-385). cols selects plotted
    quantities from Zreal/Zimag/Zmod/Zphz."""
    if cols is None:
        cols = ["Zmod", "Zphz"]
    if axes is None:
        _, axes = plt.subplots(1, len(cols), figsize=(4 * len(cols), 3))
    axes = np.atleast_1d(axes)
    f, z = _scaled(df, area)
    if unit_scale == "auto":
        unit_scale = get_unit_scale(df, area)
    factor = get_factor_from_unit(unit_scale) if unit_scale else 1.0
    series = {
        "Zreal": (z.real / factor, f"$Z^{{\\prime}}$ / {unit_scale}$\\Omega$"),
        "Zimag": (-z.imag / factor,
                  f"$-Z^{{\\prime\\prime}}$ / {unit_scale}$\\Omega$"),
        "Zmod": (np.abs(z) / factor, f"$|Z|$ / {unit_scale}$\\Omega$"),
        "Zphz": (-np.degrees(np.arctan2(z.imag, z.real)) if invert_phase
                 else np.degrees(np.arctan2(z.imag, z.real)),
                 r"$-\varphi$ / $^\circ$" if invert_phase
                 else r"$\varphi$ / $^\circ$"),
    }
    marker_size = plt_kw.pop("s", 10)
    for ax, col in zip(axes, cols):
        y, ylabel = series[col]
        if plot_func == "scatter":
            ax.scatter(f, y, s=marker_size, label=label, **plt_kw)
        else:
            ax.plot(f, y, label=label, **plt_kw)
        ax.set_xscale("log")
        if col == "Zmod":
            ax.set_yscale("log")
        ax.set_xlabel("$f$ / Hz")
        ax.set_ylabel(ylabel)
        if label:
            ax.legend()
    return axes


def plot_eis(df, plot_type="all", area=None, axes=None, label="",
             plot_func="scatter", unit_scale="auto", bode_cols=None, **plt_kw):
    """Combined Nyquist + Bode (reference: plotting.py:388-455)."""
    if plot_type == "nyquist":
        return plot_nyquist(df, area=area, ax=axes, label=label,
                            plot_func=plot_func, unit_scale=unit_scale, **plt_kw)
    if plot_type == "bode":
        return plot_bode(df, area=area, axes=axes, label=label,
                         plot_func=plot_func, cols=bode_cols,
                         unit_scale=unit_scale, **plt_kw)
    if axes is None:
        fig, axes = plt.subplots(1, 3, figsize=(12, 3.2))
    plot_nyquist(df, area=area, ax=axes[0], label=label, plot_func=plot_func,
                 unit_scale=unit_scale, **plt_kw)
    plot_bode(df, area=area, axes=axes[1:], label=label, plot_func=plot_func,
              cols=bode_cols, unit_scale=unit_scale, **plt_kw)
    plt.tight_layout()
    return axes


def plot_distribution(df, inv, ax=None, distribution=None, tau_plot=None,
                      plot_bounds=True, plot_ci=True, label="", ci_label="",
                      unit_scale="auto", freq_axis=True, area=None,
                      normalize=False, predict_kw=None, **plt_kw):
    """Recovered gamma(tau) with optional 95% credible band
    (reference: plotting.py:458-595)."""
    if predict_kw is None:
        predict_kw = {}
    if ax is None:
        _, ax = plt.subplots(figsize=(4.5, 3.2))
    if distribution is None:
        distribution = list(inv.distributions.keys())[0]
    if tau_plot is None:
        basis_tau = inv.distributions[distribution]["tau"]
        tmin, tmax = np.log10(basis_tau.min()), np.log10(basis_tau.max())
        tau_plot = np.logspace(tmin, tmax, 200)

    gamma = inv.predict_distribution(distribution, eval_tau=tau_plot,
                                     **predict_kw)
    scale = 1.0
    if normalize:
        scale = 1.0 / inv.predict_Rp(distributions=distribution)
    if area is not None:
        gamma = gamma * area
    if unit_scale == "auto" and df is not None:
        unit_scale = get_unit_scale(df, area)
    elif unit_scale == "auto":
        unit_scale = ""
    factor = get_factor_from_unit(unit_scale) if unit_scale else 1.0

    ax.plot(tau_plot, gamma * scale / factor, label=label, **plt_kw)
    if plot_ci and inv.fit_type == "bayes":
        lo = inv.predict_distribution(distribution, eval_tau=tau_plot,
                                      percentile=2.5, **predict_kw)
        hi = inv.predict_distribution(distribution, eval_tau=tau_plot,
                                      percentile=97.5, **predict_kw)
        if area is not None:
            lo, hi = lo * area, hi * area
        ax.fill_between(tau_plot, lo * scale / factor, hi * scale / factor,
                        alpha=0.25, label=ci_label or None)
    if plot_bounds and df is not None:
        f = df["Freq"].values
        for fb in (f.max(), f.min()):
            ax.axvline(1.0 / (2 * np.pi * fb), ls=":", c="gray", lw=1)
    ax.set_xscale("log")
    ax.set_xlabel(r"$\tau$ / s")
    if normalize:
        ax.set_ylabel(r"$\gamma \, / \, R_p$")
    else:
        ax.set_ylabel(f"$\\gamma$ / {unit_scale}$\\Omega$")
    if freq_axis:
        ax2 = ax.secondary_xaxis(
            "top", functions=(lambda t: 1.0 / (2 * np.pi * np.maximum(t, 1e-300)),
                              lambda f: 1.0 / (2 * np.pi * np.maximum(f, 1e-300))))
        ax2.set_xlabel("$f$ / Hz")
    if label or ci_label:
        ax.legend()
    return ax


def plot_fit(df, inv, axes=None, plot_type="all", bode_cols=None,
             plot_data=True, color="k", f_pred=None, label="fit",
             data_label="data", predict_kw=None, **plt_kw):
    """Measured data with model fit overlay (reference: plotting.py:598-684)."""
    from ..io.file_load import construct_eis_df
    if predict_kw is None:
        predict_kw = {}
    if bode_cols is None:
        bode_cols = ["Zreal", "Zimag"]
    f = df["Freq"].values
    if f_pred is None:
        f_pred = np.logspace(np.log10(f.min()), np.log10(f.max()), 200)[::-1]
    z_pred = inv.predict_Z(f_pred, **predict_kw)
    fit_df = construct_eis_df(f_pred, z_pred)

    if plot_type == "nyquist":
        ax = axes
        if plot_data:
            ax = plot_nyquist(df, ax=ax, label=data_label)
        return plot_nyquist(fit_df, ax=ax, plot_func="plot", color=color,
                            label=label, **plt_kw)
    if plot_type == "bode":
        if plot_data:
            axes = plot_bode(df, axes=axes, label=data_label, cols=bode_cols)
        return plot_bode(fit_df, axes=axes, plot_func="plot", color=color,
                         cols=bode_cols, label=label, **plt_kw)
    if axes is None:
        fig, axes = plt.subplots(1, 3, figsize=(12, 3.2))
    if plot_data:
        plot_nyquist(df, ax=axes[0], label=data_label)
        plot_bode(df, axes=axes[1:], label=data_label, cols=bode_cols)
    plot_nyquist(fit_df, ax=axes[0], plot_func="plot", color=color,
                 label=label, **plt_kw)
    plot_bode(fit_df, axes=axes[1:], plot_func="plot", color=color,
              cols=bode_cols, label=label, **plt_kw)
    plt.tight_layout()
    return axes


def plot_residuals(df, inv, axes=None, unit_scale="auto", plot_ci=True,
                   predict_kw=None):
    """Real/imag residuals with +-3 sigma band from the fitted error model
    (reference: plotting.py:687-740)."""
    if predict_kw is None:
        predict_kw = {}
    if axes is None:
        _, axes = plt.subplots(1, 2, figsize=(8, 3))
    f = df["Freq"].values
    z = df["Zreal"].values + 1j * df["Zimag"].values
    z_pred = inv.predict_Z(f, **predict_kw)
    if unit_scale == "auto":
        unit_scale = get_unit_scale(df)
    factor = get_factor_from_unit(unit_scale) if unit_scale else 1.0
    resid = (z_pred - z) / factor
    axes[0].scatter(f, resid.real, s=10)
    axes[1].scatter(f, resid.imag, s=10)
    if plot_ci and inv.fit_type in ("map", "bayes"):
        s_re, s_im = inv.predict_sigma(f)
        axes[0].fill_between(f, -3 * s_re / factor, 3 * s_re / factor,
                             color="gray", alpha=0.25, label=r"$\pm 3\sigma$")
        axes[1].fill_between(f, -3 * s_im / factor, 3 * s_im / factor,
                             color="gray", alpha=0.25, label=r"$\pm 3\sigma$")
    for ax, part in zip(axes, ("\\prime", "\\prime\\prime")):
        ax.axhline(0, c="k", lw=0.5)
        ax.set_xscale("log")
        ax.set_xlabel("$f$ / Hz")
        ax.set_ylabel(f"$\\hat{{Z}}^{{{part}}} - Z^{{{part}}}$ / "
                      f"{unit_scale}$\\Omega$")
        ax.legend()
    plt.tight_layout()
    return axes


def plot_full_results(df, inv, axes=None, bode_cols=None, plot_data=True,
                      color="k", predict_kw=None, **plt_kw):
    """2x3 grid: fit (nyquist + bode) on top, DRT + residuals below
    (reference: plotting.py:743-817)."""
    if bode_cols is None:
        bode_cols = ["Zreal", "Zimag"]
    if axes is None:
        fig, axes = plt.subplots(2, 3, figsize=(12, 6.5))
    plot_fit(df, inv, axes=axes[0], bode_cols=bode_cols, plot_data=plot_data,
             color=color, predict_kw=predict_kw or {}, **plt_kw)
    plot_distribution(df, inv, ax=axes[1, 0], predict_kw=predict_kw or {})
    plot_residuals(df, inv, axes=axes[1, 1:], predict_kw=predict_kw or {})
    plt.tight_layout()
    return axes


def plot_ocv(data, ax=None, **plt_kw):
    """OCV vs time (reference: plotting.py:14-57; simplified: takes a
    DataFrame from read_ocv rather than a directory crawl)."""
    if ax is None:
        _, ax = plt.subplots(figsize=(5, 3))
    t_col = "T" if "T" in data.columns else "Time"
    ax.plot(data[t_col].values / 3600.0, data["Vf"].values, **plt_kw)
    ax.set_xlabel("$t$ / h")
    ax.set_ylabel("OCV / V")
    return ax


def plot_jv(df, area=None, plot_pwr=True, ax=None, pwr_kw=None, marker="o",
            **plt_kw):
    """j-V (and power) curves (reference: plotting.py:60-109)."""
    if pwr_kw is None:
        pwr_kw = {"marker": "o", "mfc": "white"}
    if ax is None:
        _, ax = plt.subplots(figsize=(5, 3.5))
    i = np.abs(df["Im"].values)
    v = np.abs(df["Vf"].values)
    if area is not None:
        # convert current to current density (reference: plotting.py:68)
        i = i / area
    ax.plot(i, v, marker=marker, **plt_kw)
    ax.set_xlabel("$j$ / A$\\cdot$cm$^{-2}$" if area else "$I$ / A")
    ax.set_ylabel("$V$ / V")
    if plot_pwr:
        ax2 = ax.twinx()
        ax2.plot(i, i * v, color="gray", **pwr_kw)
        ax2.set_ylabel("$P$ / W" + ("$\\cdot$cm$^{-2}$" if area else ""))
    return ax
