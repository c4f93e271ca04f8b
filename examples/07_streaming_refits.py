"""Streaming/chained batch refits (production serving pattern).

A monitoring service re-inverts a fleet of cells every few minutes; between
batches each posterior moves only slightly. fit_spectra_batch(warm_start=
previous_result) resumes every chain from the previous batch's final state
with the adapted metric held fixed, cutting the warmup budget ~5x per
refit while matching cold-start recovery.

Run: python examples/07_streaming_refits.py
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import time

import numpy as np
import pandas as pd

from bayes_drt_tpu import sim
from bayes_drt_tpu.parallel import evaluate_gamma, fit_spectra_batch

B = 32
CHAINS = 4
gt = pd.read_csv("/root/reference/data/simulated/gamma_ZARC.csv")

freq, Zb = sim.make_benchmark_batch(B, circuit="ZARC", noise_level=0.0025,
                                    seed=0)

# --- batch 0: cold start (full warmup) -------------------------------
t0 = time.time()
res = fit_spectra_batch(freq, Zb, mode="sample", chains=CHAINS, warmup=250,
                        samples=250, max_tree_depth=5, random_seed=0,
                        ncp=True, tree_scan=True, scan_unroll=2)
print(f"cold start: {time.time()-t0:.1f}s (incl. compile)")

rp = np.trapezoid(gt["gamma"].values, np.log(gt["tau"].values))

# --- batches 1..4: the fleet degrades slowly; warm refits ------------
rng = np.random.default_rng(1)
for step in range(1, 5):
    drift = 1.0 + 0.02 * step          # slow growth of polarization
    Zb_t = drift * Zb + 0.001 * (rng.standard_normal(Zb.shape)
                                 + 1j * rng.standard_normal(Zb.shape))
    t0 = time.time()
    res = fit_spectra_batch(freq, Zb_t, mode="sample", chains=CHAINS,
                            warmup=50, samples=250, max_tree_depth=5,
                            random_seed=step, ncp=True, tree_scan=True,
                            scan_unroll=2, warm_start=res)
    el = time.time() - t0
    g = evaluate_gamma(res, gt["tau"].values)
    rmse = np.sqrt(np.mean((g.mean(axis=0) - drift * gt["gamma"].values) ** 2))
    print(f"refit {step}: {el:.1f}s ({B/(el/60):.0f} spectra/min) "
          f"gamma RMSE/Rp={rmse/(drift*rp):.4f} "
          f"div={res.diagnostics['divergence_rate'].mean():.4f}")
print("done")
