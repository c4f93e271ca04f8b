"""Time-evolving (drifting) spectra: single-cell fit and fleet form.

EIS sweeps take minutes; a degrading cell changes underneath the
measurement. The drift models fit the time evolution EXPLICITLY — each
frequency point is tagged with its measurement time and the model learns
both the distribution and its trajectory — instead of pretending the
spectrum is stationary (reference: bayes_drt `drift_map_fit`,
inversion.py:1291-1564).

Synthetic workload: a static ZARC plus a second ZARC that GROWS with time
constant 600 s, measured over three consecutive sweeps.

Run: python examples/09_drift.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt
import numpy as np

from bayes_drt_tpu import Inverter

rng = np.random.default_rng(0)
base_freq = np.logspace(5, -1, 31)
freq = np.tile(base_freq, 3)              # three consecutive sweeps
times = np.linspace(0, 3 * 1800.0, len(freq))
omega = 2 * np.pi * freq


def make_cell(drift_scale, seed):
    r = np.random.default_rng(seed)
    z = 1.0 + 1.0 / (1 + (1j * omega * 1e-3) ** 0.85) \
        + (1 - np.exp(-times / 600.0)) * (
            drift_scale / (1 + (1j * omega * 0.05) ** 0.9))
    return z + 0.001 * (r.standard_normal(len(z))
                        + 1j * r.standard_normal(len(z)))


# --- single cell: x1 drift model (X(t) relaxes from x0 to x1) ---
Z = make_cell(0.5, 1)
inv = Inverter()
inv.drift_map_fit(freq, Z, times, drift_model="x1", random_seed=0,
                  n_restarts=2, min_tau_drift=100.0, max_iter=1500)
z_hat = inv.predict_Z_drift(freq, times)
print("median rel residual at the fitted trajectory:",
      round(float(np.median(np.abs(z_hat - Z) / np.abs(Z))), 4))

tau_eval = np.logspace(-6, 1, 120)
fig, ax = plt.subplots(figsize=(5, 3.2))
for t, c in ((0.0, "C0"), (1800.0, "C1"), (5400.0, "C2")):
    g = inv.predict_distribution("DRT", eval_tau=tau_eval, time=t)
    ax.semilogx(tau_eval, g, c, label=f"t = {t / 60:.0f} min")
ax.set_xlabel(r"$\tau$ (s)")
ax.set_ylabel(r"$\gamma(\tau, t)$")
ax.legend()
fig.tight_layout()
os.makedirs("examples/out", exist_ok=True)
fig.savefig("examples/out/drift_evolution.png", dpi=100)
plt.close("all")
print("distribution evolution figure written")

# --- fleet form: many cells on one sweep schedule, one XLA program ---
from bayes_drt_tpu.parallel import drift_fit_spectra_batch

Zb = np.array([make_cell(s, 2 + i) for i, s in enumerate((0.3, 0.5, 0.7))])
t0 = time.time()
res = drift_fit_spectra_batch(freq, times, Zb, drift_model="x1",
                              random_seed=0, n_restarts=2,
                              min_tau_drift=100.0, max_iter=1500)
d = res.diagnostics
print(f"fleet of {len(Zb)} cells fit in {time.time() - t0:.1f}s "
      f"(incl. compile); per-cell reconstruction residuals:",
      np.round(d["median_rel_resid"], 4))
# diagnostics['drift'] carries every rescaled drift parameter per cell
print("per-cell drift time constants tau_1 (s):",
      np.round(d["drift"]["tau_1"], 0))
