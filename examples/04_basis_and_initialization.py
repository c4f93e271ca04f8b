"""Basis frequencies, non-negativity, and initialization (mirrors reference
Tutorial 1: "Basis frequencies, initialization, and non-negativity
constraint").

Covers:
1. Basis-frequency selection — default extended basis vs basis = measured
   frequencies, on (a) a fully-captured simulated spectrum where the short
   basis suffices and (b) an experimental spectrum with an uncaptured
   low-frequency arc where the extended basis is required.
2. Non-negativity — the RC-ZARC spectrum where nonneg=True distorts the
   sharp RC peak, and why unconstrained is the default.
3. Initialization — random restarts vs init_from_ridge on the RC-ZARC
   workload, plus the random_seed escape hatch.

Run: python examples/04_basis_and_initialization.py (figures to examples/out/)
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
from bayes_drt_tpu.io import get_fZ, read_eis

OUT = os.path.join(os.path.dirname(__file__), "out")
os.makedirs(OUT, exist_ok=True)
DATA = "/root/reference/data"

# =====================================================================
# 1a. Fully-captured spectrum: short basis is sufficient (and faster)
# =====================================================================
df_sim = pd.read_csv(f"{DATA}/simulated/Z_ZARC_Macdonald_0.25.csv")
freq_sim, Z_sim = get_fZ(df_sim)
g_true = pd.read_csv(f"{DATA}/simulated/gamma_ZARC.csv")

inv_default = Inverter()          # default: extended basis (+1 decade each side)
t0 = time.time()
inv_default.fit(freq_sim, Z_sim)
t_default = time.time() - t0
tau_d = inv_default.distributions["DRT"]["tau"]
print(f"default basis: K={len(tau_d)}, tau {tau_d.min():.1e}-{tau_d.max():.1e} s, "
      f"fit {t_default:.2f} s")

inv_short = Inverter(basis_freq=np.sort(freq_sim)[::-1])   # basis = measured freqs
t0 = time.time()
inv_short.fit(freq_sim, Z_sim)
t_short = time.time() - t0
tau_s = inv_short.distributions["DRT"]["tau"]
print(f"short basis:   K={len(tau_s)}, tau {tau_s.min():.1e}-{tau_s.max():.1e} s, "
      f"fit {t_short:.2f} s")

fig, ax = plt.subplots(figsize=(5, 3.2))
ax.plot(g_true["tau"], g_true["gamma"], "k--", label="True")
for inv, lbl in [(inv_default, "default basis"), (inv_short, "basis = meas. freqs")]:
    g = inv.predict_distribution("DRT", eval_tau=g_true["tau"].values)
    ax.plot(g_true["tau"], g, label=lbl)
ax.set_xscale("log")
ax.set_xlabel(r"$\tau$ (s)")
ax.set_ylabel(r"$\gamma$ ($\Omega$)")
ax.legend()
fig.tight_layout()
fig.savefig(os.path.join(OUT, "basis_captured.png"), dpi=100)

# =====================================================================
# 1b. Uncaptured low-frequency arc: extended basis is necessary
# =====================================================================
df_exp = read_eis(f"{DATA}/experimental/PDAC_COM3_02109_Contact10_2065C_500C.txt")
freq_exp, Z_exp = get_fZ(df_exp)

fig, axes = plt.subplots(1, 2, figsize=(8, 3.2))
for basis, lbl in [(None, "extended (default)"), (np.sort(freq_exp)[::-1], "measured only")]:
    inv = Inverter(basis_freq=basis)
    inv.fit(freq_exp, Z_exp)
    z_hat = inv.predict_Z(freq_exp)
    axes[0].plot(z_hat.real, -z_hat.imag, label=lbl)
    inv.plot_distribution(ax=axes[1], label=lbl)
axes[0].scatter(Z_exp.real, -Z_exp.imag, s=8, c="k", alpha=0.4, label="data")
axes[0].set_xlabel(r"$Z'$")
axes[0].set_ylabel(r"$-Z''$")
axes[0].legend()
axes[1].set_xscale("log")
axes[1].legend()
fig.tight_layout()
fig.savefig(os.path.join(OUT, "basis_truncated_arc.png"), dpi=100)
print("saved basis comparison figures")

# =====================================================================
# 2. Non-negativity constraint: RC-ZARC (sharp RC peak)
# =====================================================================
df2 = pd.read_csv(f"{DATA}/simulated/Z_RC-ZARC_Macdonald_0.25.csv")
freq2, Z2 = get_fZ(df2)
g_true2 = pd.read_csv(f"{DATA}/simulated/gamma_RC-ZARC.csv")

inv_unbnd, inv_nonneg = Inverter(), Inverter()
t0 = time.time(); inv_unbnd.fit(freq2, Z2); t_u = time.time() - t0
t0 = time.time(); inv_nonneg.fit(freq2, Z2, nonneg=True); t_n = time.time() - t0
print(f"unconstrained fit {t_u:.2f} s; non-negative fit {t_n:.2f} s")

fig, ax = plt.subplots(figsize=(5, 3.2))
ax.plot(g_true2["tau"], g_true2["gamma"], "k--", label="True (continuous part)")
for inv, lbl in [(inv_unbnd, "unconstrained"), (inv_nonneg, "nonneg=True")]:
    g = inv.predict_distribution("DRT", eval_tau=g_true2["tau"].values)
    ax.plot(g_true2["tau"], g, label=lbl)
ax.set_xscale("log")
ax.set_xlabel(r"$\tau$ (s)")
ax.set_ylabel(r"$\gamma$ ($\Omega$)")
ax.legend()
fig.tight_layout()
fig.savefig(os.path.join(OUT, "nonneg_comparison.png"), dpi=100)

# =====================================================================
# 3. Initialization: random restarts vs ridge initialization
# =====================================================================
inv_rand, inv_ridge = Inverter(), Inverter()
t0 = time.time()
inv_rand.fit(freq2, Z2, nonneg=True, random_seed=1234)
print(f"random init fit {time.time() - t0:.2f} s, "
      f"lp = {inv_rand._opt_result['lp__']:.1f}")
t0 = time.time()
inv_ridge.fit(freq2, Z2, nonneg=True, init_from_ridge=True)
print(f"ridge init fit  {time.time() - t0:.2f} s, "
      f"lp = {inv_ridge._opt_result['lp__']:.1f}")

# the random_seed escape hatch: initialization sensitivity is diagnosed by
# refitting with another seed (reference Tutorial 1 section 3b); the vmapped
# n_restarts argument automates exactly this (best-of-N restarts in one
# XLA program), so a single well-seeded call is usually enough here
inv_rand.fit(freq2, Z2, nonneg=True, random_seed=354, n_restarts=4)
print(f"4 vmapped restarts lp = {inv_rand._opt_result['lp__']:.1f}")

fig, ax = plt.subplots(figsize=(5, 3.2))
ax.plot(g_true2["tau"], g_true2["gamma"], "k--", label="True")
for inv, lbl in [(inv_rand, "restarts (best of 4)"), (inv_ridge, "init_from_ridge")]:
    g = inv.predict_distribution("DRT", eval_tau=g_true2["tau"].values)
    ax.plot(g_true2["tau"], g, label=lbl)
ax.set_xscale("log")
ax.legend()
fig.tight_layout()
fig.savefig(os.path.join(OUT, "initialization.png"), dpi=100)
print("done; figures in examples/out/")
