"""TPU numbers for BASELINE configs 1-3: ordinary ridge, hyper-lambda
ridge, and MAP (L-BFGS), batched at B=512.

Reference anchors (BASELINE.md): hyper-lambda ridge 0.10 s/spectrum
(tutorials/1 "Initial ridge fit time"), MAP ~2.0 s/spectrum (tutorials/0
"MAP fit time"). Ordinary ridge has no recorded reference number; the
0.10 s ridge row is used as its (conservative) anchor too.

Protocol: prime each program (compile + lazy link), best-of-3 timed runs,
recovery gate on the ZARC ground truth. Prints one line per config.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import pandas as pd

B = 512
REPEATS = 3


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_compile_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    from bayes_drt_tpu import sim
    from bayes_drt_tpu.parallel import (evaluate_gamma, fit_spectra_batch,
                                        ridge_fit_spectra_batch)

    freq, Zb = sim.make_benchmark_batch(B, circuit="ZARC",
                                        noise_level=0.0025, seed=0)
    gt = pd.read_csv("/root/reference/data/simulated/gamma_ZARC.csv")
    gt_tau, gt_g = gt["tau"].values, gt["gamma"].values
    rp = np.trapezoid(gt_g, np.log(gt_tau))

    configs = [
        ("ridge-ordinary", 0.10,
         lambda seed: ridge_fit_spectra_batch(freq, Zb, hyper_lambda=False,
                                              penalty="integral",
                                              weights="modulus",
                                              lambda_0=1e-2)),
        ("ridge-hyper-lambda", 0.10,
         lambda seed: ridge_fit_spectra_batch(freq, Zb)),
        ("map-lbfgs", 2.0,
         lambda seed: fit_spectra_batch(freq, Zb, mode="optimize",
                                        max_iter=2000, n_restarts=2,
                                        random_seed=seed)),
    ]

    for name, ref_sec, run in configs:
        t0 = time.time()
        run(0)
        print(f"[{name}] prime {time.time()-t0:.1f}s", file=sys.stderr,
              flush=True)
        best, res = float("inf"), None
        for rep in range(REPEATS):
            t0 = time.time()
            r = run(rep + 1)
            el = time.time() - t0
            print(f"[{name}] rep{rep} {el:.2f}s", file=sys.stderr, flush=True)
            if el < best:
                best, res = el, r

        g = evaluate_gamma(res, gt_tau)
        rmse = float(np.sqrt(np.mean((g.mean(0) - gt_g) ** 2)))
        per = np.sqrt(np.mean((g - gt_g[None, :]) ** 2, axis=1))
        p90 = float(np.percentile(per, 90))
        spm = B / (best / 60.0)
        ref_spm = 60.0 / ref_sec
        print(f"{name}: best={best:.3f}s spm={spm:.0f} "
              f"sec/spectrum={best/B*1e3:.3f}ms "
              f"vs_ref={spm/ref_spm:.0f}x "
              f"rmse={100*rmse/rp:.2f}%Rp p90={100*p90/rp:.2f}%Rp",
              flush=True)


if __name__ == "__main__":
    main()
