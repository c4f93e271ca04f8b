"""Extracting and saving fit data (mirrors reference Tutorial 4).

Fits one spectrum, then shows the data-extraction surface — predicted
impedance, distribution values, error structure, polarization resistance,
goodness of fit — and the save/load round trip with 'all' vs 'core'
manifests (core omits recomputable matrices; predictions after a core load
rebuild them transparently).

Run: python examples/06_extract_and_save.py  (writes to examples/out/)
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

df = pd.read_csv("/root/reference/data/simulated/Z_ZARC_Macdonald_0.25.csv")
freq, Z = get_fZ(df)

# --- 1. fit -----------------------------------------------------------
inv = Inverter(basis_freq=np.sort(freq)[::-1])
inv.fit(freq, Z, nonneg=True)

# --- 2. extract values ------------------------------------------------
f_pred = np.logspace(7, -3, 101)
Z_pred = inv.predict_Z(f_pred)
print("predicted impedance (first 3):", Z_pred[:3])

tau_pred = np.logspace(-8, 3, 200)
gamma_pred = inv.predict_distribution(eval_tau=tau_pred)
print("distribution values (first 3):", gamma_pred[:3])

sigma_re, sigma_im = inv.predict_sigma(f_pred)
print("error scale (first 3):", sigma_re[:3], sigma_im[:3])

print("polarization resistance:", inv.predict_Rp())
print("chi-square (modulus weights):", inv.score(freq, Z, weights="modulus"))

# --- 3. save/load round trip -----------------------------------------
full_file = os.path.join(OUT, "all_fit_data.pkl")
core_file = os.path.join(OUT, "core_fit_data.pkl")
inv.save_fit_data(full_file, which="all")
inv.save_fit_data(core_file, which="core")
print(f"full data: {os.path.getsize(full_file)/1000:.1f} kB, "
      f"core data: {os.path.getsize(core_file)/1000:.1f} kB")

inv_full, inv_core = Inverter(), Inverter()
inv_full.load_fit_data(full_file)
t0 = time.time()
Z_full = inv_full.predict_Z(freq)
print(f"prediction with full data: {time.time()-t0:.2f} s")

inv_core.load_fit_data(core_file)
t0 = time.time()
Z_core = inv_core.predict_Z(freq)   # rebuilds prediction matrices
print(f"prediction with core data (matrices rebuilt): {time.time()-t0:.2f} s")
assert np.allclose(Z_full, Z_core)

inv_core.plot_full_results()
plt.savefig(os.path.join(OUT, "loaded_fit_results.png"), dpi=100)
print("done; figures in examples/out/")
