"""Back-to-back TPU A/B: SHMC matmul precision 'highest' (true f32, 6 bf16
MXU passes) vs 'high' (bf16x3, 3 passes) at the adopted bench config.

Rationale: progcache.precise_matmuls forces full-f32 matmuls because plain
bf16 gradient noise destabilizes leapfrog integration (round-2 finding,
~12% runtime cost vs the bf16 default). bf16x3 sits between: ~f32-like
error at half the MXU passes. If the leaf cost is matmul-bound, 'high'
buys real throughput; the quality gates (rmse/p90/coverage/lpR/div) decide
whether the extra rounding is tolerable.

Protocol (CLAUDE.md): one process, serial TPU access, prime each config,
best-of-N timed repeats, baseline repeated at the end to bound drift.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import pandas as pd

B = 512
CHAINS = 4
WARMUP = 150
SAMPLES = 250
REPEATS = 2


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

    base = dict(n_steps=32, warm_steps=32, leaf_unroll=2, draw_unroll=2,
                recompute_grad=True, eps_quantile=0.5)
    configs = [
        ("highest", SHMCConfig(**base)),
        ("high", SHMCConfig(**base, precision="high")),
        ("highest-rep", SHMCConfig(**base)),
    ]

    for name, cfg in configs:
        t0 = time.time()
        fit_spectra_batch(freq, Zb, mode="sample", chains=CHAINS,
                          warmup=WARMUP, samples=SAMPLES, random_seed=0,
                          ncp=True, sampler="shmc", shmc_cfg=cfg,
                          gamma_eval_tau=gt_tau)
        print(f"[{name}] prime {time.time()-t0:.1f}s", file=sys.stderr,
              flush=True)

        best = float("inf")
        res = None
        for rep in range(REPEATS):
            t0 = time.time()
            r = fit_spectra_batch(freq, Zb, mode="sample", chains=CHAINS,
                                  warmup=WARMUP, samples=SAMPLES,
                                  random_seed=1 + rep, ncp=True,
                                  sampler="shmc", shmc_cfg=cfg,
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
        ess_sec = float(np.sum(d["min_ess"]) / best)
        print(f"{name}: best={best:.2f}s spm={spm:.0f} "
              f"rmse={100*rmse/rp:.2f}%Rp p90={100*p90/rp:.2f}%Rp "
              f"cov={cov:.3f} minESS(med)={ess_med:.1f} "
              f"ess/sec={ess_sec:.0f} "
              f"div={float(d['divergence_rate'].mean()):.3f} "
              f"lpR(med)={float(np.median(d['logp_rhat'])):.2f}",
              flush=True)


if __name__ == "__main__":
    main()
