"""Outlier-robust fitting and DDT recovery (mirrors reference Tutorials 3/5).

Run: python examples/02_outliers_and_ddt.py
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt
import numpy as np
import pandas as pd

from bayes_drt_tpu import Inverter
from bayes_drt_tpu.io import read_eis, get_fZ

# --- Tutorial 3 workload: experimental spectrum with outliers ---
df = read_eis("/root/reference/data/experimental/"
              "PDAC_COM3_02109_Contact10_2065C_500C.txt", warn=False)
freq, Z = get_fZ(df)

inv = Inverter(basis_freq=np.logspace(7, -3, 101))
inv.fit(freq, Z, outliers="auto", nonneg=True)   # auto-detects corrupted points
print("model:", inv.stan_model_name)
if "sigma_out" in inv.error_fit:
    flagged = np.argsort(inv.error_fit["sigma_out"])[-4:]
    print("largest outlier contributions at indices:", sorted(flagged))

inv.plot_full_results()
plt.savefig("examples/out/outliers_fit.png", dpi=100)
plt.close("all")

# --- Tutorial 5 workload: transmissive-planar DDT ---
df5 = pd.read_csv("/root/reference/data/simulated/Z_BimodalTP-DDT_uniform_0.05.csv")
freq5 = df5["Freq"].values
Z5 = df5["Zreal"].values + 1j * df5["Zimag"].values

inv_ddt = Inverter(distributions={
    "DDT": {"kernel": "DDT", "symmetry": "planar", "bc": "transmissive",
            "dist_type": "parallel", "basis_freq": np.logspace(6, -3, 91)}})
inv_ddt.fit(freq5, Z5, n_restarts=3)

gt = pd.read_csv("/root/reference/data/simulated/gamma_BimodalTP-DDT.csv")
ax = inv_ddt.plot_distribution()
ax.plot(gt["tau"], gt["gamma"], "k--", label="true")
ax.legend()
plt.savefig("examples/out/ddt_recovery.png", dpi=100)
plt.close("all")
print("DDT figures written")
