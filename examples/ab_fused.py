"""Back-to-back TPU A/B: flat_tree vs fused_draws persistent-loop sampler.

Runs the exact bench.py workload (B=512 ZARC spectra, 4 chains x 250+250,
max_depth 6, ncp) with the flat tree builder, then the fused one-while_loop
-per-chain sampler, then the flat builder again (throughput drifts ~±25%
across separate runs; the repeated baseline bounds the drift within-process).
Prints per-config spectra/min to stderr and a JSON summary to stdout.
"""

import json
import os
import sys
import time

import numpy as np
import pandas as pd

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))


B = 512
CHAINS = 4
WARMUP = 250
SAMPLES = 250
MAX_DEPTH = 6


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_compile_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    from bayes_drt_tpu.parallel import evaluate_gamma, fit_spectra_batch
    from bayes_drt_tpu import sim

    freq, Zb = sim.make_benchmark_batch(B, circuit="ZARC",
                                        noise_level=0.0025, seed=0)
    gt = pd.read_csv("/root/reference/data/simulated/gamma_ZARC.csv")
    rp = np.trapezoid(gt["gamma"].values, np.log(gt["tau"].values))

    configs = [("flat", dict(flat_tree=True)),
               ("fused", dict(fused_draws=True)),
               ("flat2", dict(flat_tree=True))]

    # warm the compile cache for both programs
    for name, kw in configs[:2]:
        t0 = time.time()
        fit_spectra_batch(freq, Zb, mode="sample", chains=CHAINS,
                          warmup=WARMUP, samples=SAMPLES,
                          max_tree_depth=MAX_DEPTH, random_seed=0, ncp=True,
                          **kw)
        print(f"warm {name}: {time.time()-t0:.1f}s", file=sys.stderr)

    out = {}
    for name, kw in configs:
        t0 = time.time()
        res = fit_spectra_batch(freq, Zb, mode="sample", chains=CHAINS,
                                warmup=WARMUP, samples=SAMPLES,
                                max_tree_depth=MAX_DEPTH, random_seed=1,
                                ncp=True, **kw)
        el = time.time() - t0
        gammas = evaluate_gamma(res, gt["tau"].values)
        rmse = float(np.sqrt(np.mean(
            (gammas.mean(axis=0) - gt["gamma"].values) ** 2)))
        spm = B / (el / 60.0)
        out[name] = {"spectra_per_min": round(spm, 1), "elapsed_s": round(el, 1),
                     "gamma_rmse_over_rp": round(rmse / rp, 4),
                     "n_leapfrog": float(res.diagnostics["n_leapfrog"].mean())}
        print(f"{name}: {spm:.0f} spectra/min ({el:.1f}s) "
              f"rmse/Rp={rmse/rp:.4f}", file=sys.stderr)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
