"""Quick start (mirrors reference Tutorial 0).

MAP and HMC fits of a simulated RC-ZARC spectrum, recovered-distribution
plots with credible intervals, and residual diagnostics.

Run: python examples/00_quick_start.py  (writes figures to examples/out/)
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

df = pd.read_csv("/root/reference/data/simulated/Z_RC-ZARC_Macdonald_0.25.csv")
freq, Z = get_fZ(df)

# --- MAP fit (seconds) ---
inv = Inverter(basis_freq=np.sort(freq)[::-1])  # basis = measurement freqs
start = time.time()
inv.fit(freq, Z)
print(f"MAP fit time: {time.time() - start:.2f} s")
print(f"R_inf = {inv.R_inf:.4f}, Rp = {inv.predict_Rp():.4f}")

inv.plot_full_results()
plt.savefig(os.path.join(OUT, "quickstart_map.png"), dpi=100)
plt.close("all")

# --- HMC fit (posterior + credible intervals) ---
inv_hmc = Inverter(basis_freq=np.sort(freq)[::-1])
start = time.time()
inv_hmc.fit(freq, Z, mode="sample", warmup=200, samples=200, chains=2)
print(f"HMC fit time: {time.time() - start:.2f} s")
print("diagnostics:", {k: round(v, 3) for k, v in
                       inv_hmc.sample_diagnostics.items()
                       if isinstance(v, float)})

ax = inv_hmc.plot_distribution(plot_ci=True)
gt = pd.read_csv("/root/reference/data/simulated/gamma_RC-ZARC.csv")
ax.plot(gt["tau"], gt["gamma"], "k--", label="true")
ax.legend()
plt.savefig(os.path.join(OUT, "quickstart_hmc_drt.png"), dpi=100)
plt.close("all")
print("figures written to", OUT)
