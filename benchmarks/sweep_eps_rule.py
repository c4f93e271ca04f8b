"""Back-to-back TPU A/B: sampling-eps pooling rule (min vs quantile).

sweep_warmup.py showed the pooled-MIN step-size rule is what makes long
warmup hurt: one timid chain freezes everyone's eps. SHMCConfig.eps_quantile
runs sampling at a quantile of the per-chain adapted step sizes instead.
Divergent legs are never multinomial-selected, so a larger frozen eps
trades wasted trajectory for faster mixing. If q=0.25/0.5 improves mixing
at equal speed, shorter trajectories (n36) may also hold their gates.
Anchor: the adopted bench config (w150/n44/B1024, eps_quantile=0).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import pandas as pd

B = 1024
CHAINS = 4
WARMUP = 150
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

    def sh(n_steps, q):
        return SHMCConfig(n_steps=n_steps, warm_steps=32, leaf_unroll=2,
                          draw_unroll=2, recompute_grad=True,
                          eps_quantile=q)

    def shw(n_steps, q, warm_steps):
        return SHMCConfig(n_steps=n_steps, warm_steps=warm_steps,
                          leaf_unroll=2, draw_unroll=2, recompute_grad=True,
                          eps_quantile=q)

    # (name, cfg, warmup)
    configs = [
        ("n32-q50-w150-base", sh(32, 0.5), 150),
        ("n32-q50-w125", sh(32, 0.5), 125),
        ("n32-q50-w150-ws24", shw(32, 0.5, 24), 150),
        ("n32-q50-w125-ws24", shw(32, 0.5, 24), 125),
        ("n32-q50-w150-rep", sh(32, 0.5), 150),
    ]

    for name, cfg, warmup in configs:
        kw = dict(mode="sample", chains=CHAINS, warmup=warmup,
                  samples=SAMPLES, ncp=True, sampler="shmc", shmc_cfg=cfg,
                  gamma_eval_tau=gt_tau)
        t0 = time.time()
        fit_spectra_batch(freq, Zb, random_seed=0, **kw)
        print(f"[{name}] prime {time.time()-t0:.1f}s", file=sys.stderr,
              flush=True)

        best = float("inf")
        res = None
        for rep in range(REPEATS):
            t0 = time.time()
            r = fit_spectra_batch(freq, Zb, random_seed=1 + rep, **kw)
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
              f"ess/sec={ess_sec:.0f} div={float(d['divergence_rate'].mean()):.3f} "
              f"lpR(med)={float(np.median(d['logp_rhat'])):.2f}",
              flush=True)


if __name__ == "__main__":
    main()
