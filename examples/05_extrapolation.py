"""Extrapolating beyond the measurement range (mirrors reference Tutorial 2).

A truncated spectrum (high-frequency RL element and low-frequency ZARC both
cut off by the measurement window) is fitted with the default extended
basis; the fit is then extrapolated over the full frequency range of the
untruncated simulation and compared to the true impedance — first as a MAP
point estimate, then with HMC credible intervals from predict_Z(percentile)
and the full posterior impedance sample matrix predict_Z_distribution.

Run: python examples/05_extrapolation.py  (writes figures to examples/out/)
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import time

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt
import numpy as np
import pandas as pd

from bayes_drt_tpu import Inverter
from bayes_drt_tpu.io import get_fZ

OUT = os.path.join(os.path.dirname(__file__), "out")
os.makedirs(OUT, exist_ok=True)
DATA = "/root/reference/data/simulated"

# truncated, noisy measurement + the noiseless truth over the full range
df = pd.read_csv(f"{DATA}/Z_trunc_uniform_0.25.csv")
freq, Z = get_fZ(df)
df_full = pd.read_csv(f"{DATA}/Z_trunc_noiseless_FullRange.csv")
f_pred = df_full["Freq"].values
Z_true = df_full["Zreal"].values + 1j * df_full["Zimag"].values
g_true = pd.read_csv(f"{DATA}/gamma_trunc.csv")

print(f"measured range: {freq.min():.2g}-{freq.max():.2g} Hz; "
      f"prediction range: {f_pred.min():.2g}-{f_pred.max():.2g} Hz")

# --- MAP fit + extrapolation ---------------------------------------
inv_map = Inverter()          # default extended basis covers the full range
t0 = time.time()
inv_map.fit(freq, Z)
print(f"MAP fit time: {time.time() - t0:.2f} s")
Z_map = inv_map.predict_Z(f_pred)

fig, axes = plt.subplots(1, 2, figsize=(8, 3.2))
axes[0].plot(Z_true.real, -Z_true.imag, "k--", label="True")
axes[0].plot(Z_map.real, -Z_map.imag, label="Extrapolated (MAP)")
axes[0].scatter(Z.real, -Z.imag, s=10, alpha=0.5, label="Truncated data")
axes[0].set_xlabel(r"$Z'$")
axes[0].set_ylabel(r"$-Z''$")
axes[0].legend()
tau_plot = np.logspace(-8, 3, 200)
g_map = inv_map.predict_distribution("DRT", eval_tau=tau_plot)
axes[1].plot(g_true["tau"], g_true["gamma"], "k--", label="True")
axes[1].plot(tau_plot, g_map, label="MAP")
axes[1].set_xscale("log")
axes[1].set_xlabel(r"$\tau$ (s)")
axes[1].set_ylabel(r"$\gamma$ ($\Omega$)")
axes[1].legend()
fig.tight_layout()
fig.savefig(os.path.join(OUT, "extrapolation_map.png"), dpi=100)

# quantify extrapolation quality where the model is well-posed (low freq)
low = f_pred < freq.min()
err_low = np.median(np.abs(Z_map[low] - Z_true[low]) / np.abs(Z_true[low]))
print(f"median relative extrapolation error below measured range: {err_low:.3f}")

# --- HMC fit: credible intervals for the extrapolation --------------
inv_hmc = Inverter()
t0 = time.time()
inv_hmc.fit(freq, Z, mode="sample", warmup=200, samples=200, chains=2)
print(f"HMC sampling time: {time.time() - t0:.2f} s")

Z_mean = inv_hmc.predict_Z(f_pred)
Z_lo = inv_hmc.predict_Z(f_pred, percentile=2.5)
Z_hi = inv_hmc.predict_Z(f_pred, percentile=97.5)

fig, axes = plt.subplots(1, 2, figsize=(8, 3.2))
for ax, part, sign in [(axes[0], "real", 1), (axes[1], "imag", -1)]:
    ax.fill_between(f_pred, sign * getattr(Z_lo, part), sign * getattr(Z_hi, part),
                    alpha=0.2, label="95% CI")
    ax.plot(f_pred, sign * getattr(Z_true, part), "k--", label="True")
    ax.plot(f_pred, sign * getattr(Z_mean, part), label="Posterior mean")
    ax.scatter(freq, sign * getattr(Z, part), s=8, alpha=0.5, label="Data")
    ax.set_xscale("log")
    ax.set_xlabel("f (Hz)")
    ax.set_ylabel(("$Z'$" if part == "real" else "$-Z''$"))
axes[0].legend()
fig.tight_layout()
fig.savefig(os.path.join(OUT, "extrapolation_ci.png"), dpi=100)

# full posterior impedance sample matrix: uncertainty grows outside the
# measured window (reference Tutorial 2 final cell)
Z_mat = inv_hmc.predict_Z_distribution(f_pred)
print(f"posterior Z sample matrix: {Z_mat.shape}")
spread = np.abs(Z_hi - Z_lo) / np.abs(Z_true)
print(f"median CI width / |Z|: in-range {np.median(spread[~low]):.3f}, "
      f"extrapolated {np.median(spread[low]):.3f}")

fig, ax = plt.subplots(figsize=(5, 3.2))
for i in range(0, Z_mat.shape[0], Z_mat.shape[0] // 50):
    ax.plot(Z_mat[i].real, -Z_mat[i].imag, color="C0", alpha=0.05)
ax.plot(Z_true.real, -Z_true.imag, "k--", label="True")
ax.set_xlabel(r"$Z'$")
ax.set_ylabel(r"$-Z''$")
ax.legend()
fig.tight_layout()
fig.savefig(os.path.join(OUT, "extrapolation_samples.png"), dpi=100)
print("done; figures in examples/out/")
