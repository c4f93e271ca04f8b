"""Back-to-back TPU sweep of SHMC trajectory lengths (n_steps x warm_steps).

Finds the throughput/quality frontier for the bench config: shorter
sampling trajectories buy throughput linearly but cost CI coverage and
min-ESS; shorter warmup trajectories are nearly free until the adapted
step size degrades (round-3 finding: the per-draw accept statistic needs
>= ~16 leaves to keep dual averaging stable).

Protocol (CLAUDE.md): one process, serial TPU access, every config primed
before timing, best-of-N repeats, baseline repeated at the end to bound
the tunnel's ~25% throughput drift.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import pandas as pd

B = 512
CHAINS = 4
WARMUP = 250
SAMPLES = 250
REPEATS = 3


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_compile_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    from bayes_drt_tpu import sim
    from bayes_drt_tpu.infer.chees import SHMCConfig
    from bayes_drt_tpu.parallel import evaluate_gamma, fit_spectra_batch

    freq, Zb = sim.make_benchmark_batch(B, circuit="ZARC",
                                        noise_level=0.0025, seed=0)
    gt = pd.read_csv("/root/reference/data/simulated/gamma_ZARC.csv")
    gt_tau = gt["tau"].values
    gt_g = gt["gamma"].values
    rp = np.trapezoid(gt_g, np.log(gt_tau))

    def cfg(n, w):
        return SHMCConfig(n_steps=n, warm_steps=w, leaf_unroll=2,
                          draw_unroll=2, recompute_grad=True)

    configs = [
        ("n48w32", cfg(48, 32)),      # current bench config (baseline)
        ("n44w28", cfg(44, 28)),
        ("n40w32", cfg(40, 32)),
        ("n40w24", cfg(40, 24)),
        ("n36w24", cfg(36, 24)),
        ("n40w16", cfg(40, 16)),
        ("n48w32-rep", cfg(48, 32)),  # drift bound
    ]

    for name, scfg in configs:
        t0 = time.time()
        fit_spectra_batch(freq, Zb, mode="sample", chains=CHAINS,
                          warmup=WARMUP, samples=SAMPLES, random_seed=0,
                          ncp=True, sampler="shmc", shmc_cfg=scfg,
                          gamma_eval_tau=gt_tau)
        print(f"[{name}] prime {time.time()-t0:.1f}s", file=sys.stderr,
              flush=True)

        best, res = float("inf"), None
        for rep in range(REPEATS):
            t0 = time.time()
            r = fit_spectra_batch(freq, Zb, mode="sample", chains=CHAINS,
                                  warmup=WARMUP, samples=SAMPLES,
                                  random_seed=1 + rep, ncp=True,
                                  sampler="shmc", shmc_cfg=scfg,
                                  gamma_eval_tau=gt_tau)
            el = time.time() - t0
            print(f"[{name}] rep{rep} {el:.2f}s", file=sys.stderr, flush=True)
            if el < best:
                best, res = el, r

        d = res.diagnostics
        g = evaluate_gamma(res, gt_tau)
        rmse = float(np.sqrt(np.mean((g.mean(0) - gt_g) ** 2)))
        per = np.sqrt(np.mean((g - gt_g[None, :]) ** 2, axis=1))
        p90 = float(np.percentile(per, 90))
        cov = float(np.mean((gt_g[None, :] >= d["gamma_eval_lo"])
                            & (gt_g[None, :] <= d["gamma_eval_hi"])))
        spm = B / (best / 60.0)
        ess_med = float(np.median(d["min_ess"]))
        ess_p10 = float(np.percentile(d["min_ess"], 10))
        ess_sec = float(np.sum(d["min_ess"]) / best)
        print(f"{name}: best={best:.2f}s spm={spm:.0f} "
              f"rmse={100*rmse/rp:.2f}%Rp p90={100*p90/rp:.2f}%Rp "
              f"cov={cov:.3f} minESS(med/p10)={ess_med:.1f}/{ess_p10:.1f} "
              f"ess/sec={ess_sec:.0f} div={float(d['divergence_rate'].mean()):.3f} "
              f"lpR(med)={float(np.median(d['logp_rhat'])):.2f}",
              flush=True)


if __name__ == "__main__":
    main()
