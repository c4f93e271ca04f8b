"""Back-to-back TPU A/B: SHMC traj_store (store-then-select, one Gumbel-max
categorical per draw) vs the streaming per-leaf multinomial, at the adopted
bench config.

Rationale: the round-3 cost model puts the SHMC leaf at ~0.078 ms vs a bare
leapfrog's 0.046 ms — the gap is per-leaf selection bookkeeping (proposal
carries, freeze selects, logaddexp/take). traj_store removes all of it from
the leaf: states are stacked scan outputs, dead legs carry w=-inf instead
of freezing, and selection happens once per draw. Identical target
distribution (reservoir sampling vs Gumbel-max are both exact categorical),
different RNG stream, so quality gates are re-checked, not diffed.

Protocol (CLAUDE.md): one process, serial TPU access, prime each config,
best-of-N timed repeats, baseline repeated at the end to bound drift.
Also reports the new rank-normalized gates (rank_rhat_max / ess_bulk_min
medians) for both arms and for a deliberately crippled config (n_steps=12,
warmup=50) to calibrate the bench gate thresholds (VERDICT item 3).
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
                recompute_grad=True, eps_quantile=0.5, precision="high")
    configs = [
        ("stream", SHMCConfig(**base), WARMUP, SAMPLES),
        ("store", SHMCConfig(**base, traj_store=True), WARMUP, SAMPLES),
        ("store-crippled", SHMCConfig(**{**base, "n_steps": 12,
                                         "warm_steps": 12},
                                      traj_store=True), 50, SAMPLES),
        ("stream-rep", SHMCConfig(**base), WARMUP, SAMPLES),
    ]

    for name, cfg, warm, samp in configs:
        def run(seed):
            return fit_spectra_batch(freq, Zb, mode="sample", chains=CHAINS,
                                     warmup=warm, samples=samp,
                                     random_seed=seed, ncp=True,
                                     sampler="shmc", shmc_cfg=cfg,
                                     gamma_eval_tau=gt_tau)

        t0 = time.time()
        run(0)
        print(f"[{name}] prime {time.time()-t0:.1f}s", file=sys.stderr,
              flush=True)

        best, res = float("inf"), None
        for rep in range(REPEATS):
            t0 = time.time()
            r = run(1 + rep)
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
        print(f"{name}: best={best:.2f}s spm={spm:.0f} "
              f"rmse={100*rmse/rp:.2f}%Rp p90={100*p90/rp:.2f}%Rp "
              f"cov={cov:.3f} minESS(med)={float(np.median(d['min_ess'])):.1f} "
              f"ess/sec={float(np.sum(d['min_ess']) / best):.0f} "
              f"div={float(d['divergence_rate'].mean()):.3f} "
              f"lpR(med)={float(np.median(d['logp_rhat'])):.2f} "
              f"rankRhat(med)={float(np.median(d['rank_rhat_max'])):.2f} "
              f"rankRhat(p90)={float(np.percentile(d['rank_rhat_max'], 90)):.2f} "
              f"essBulkMin(med)={float(np.median(d['ess_bulk_min'])):.1f}",
              flush=True)


if __name__ == "__main__":
    main()
