"""The literal north-star budget: 4 chains x (500 warmup + 500 draws) per
spectrum — the exact sampling budget of the reference's headline observation
(code_EchemActa/"Run fits.ipynb" 4-chain 1000-iteration cell: 515.5 s for
ONE spectrum on CPU) — run over a B-spectrum batch on one TPU chip with the
production sampler, full quality gates on.

Unlike bench.py (which scales the baseline to its shorter 4x400 budget),
this compares against the UNSCALED 515.5 s/spectrum. Also reports whether
the w150-tuned sampler settings transfer to the 500-draw budget (divergence
rate, logp-Rhat, rank-Rhat, coverage all printed).

Usage: python benchmarks/northstar.py [--b 1024] [--n-steps 32]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import pandas as pd

BASELINE_SEC_PER_SPECTRUM = 515.5     # unscaled reference, same 4x1000 budget


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--b", type=int, default=1024)
    ap.add_argument("--n-steps", type=int, default=32)
    ap.add_argument("--warmup", type=int, default=500)
    ap.add_argument("--samples", type=int, default=500)
    ap.add_argument("--repeats", type=int, default=2)
    ap.add_argument("--traj-store", action="store_true")
    args = ap.parse_args()

    import jax
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_compile_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    from bayes_drt_tpu import sim
    from bayes_drt_tpu.infer.chees import SHMCConfig
    from bayes_drt_tpu.parallel import evaluate_gamma, fit_spectra_batch

    freq, Zb = sim.make_benchmark_batch(args.b, circuit="ZARC",
                                        noise_level=0.0025, seed=0)
    gt = pd.read_csv("/root/reference/data/simulated/gamma_ZARC.csv")
    gt_tau, gt_g = gt["tau"].values, gt["gamma"].values
    rp = np.trapezoid(gt_g, np.log(gt_tau))

    cfg = SHMCConfig(n_steps=args.n_steps, warm_steps=32, leaf_unroll=2,
                     draw_unroll=2, recompute_grad=True, eps_quantile=0.5,
                     precision="high", traj_store=args.traj_store)

    def run(seed):
        return fit_spectra_batch(freq, Zb, mode="sample", chains=4,
                                 warmup=args.warmup, samples=args.samples,
                                 random_seed=seed, ncp=True, sampler="shmc",
                                 shmc_cfg=cfg, gamma_eval_tau=gt_tau)

    t0 = time.time()
    run(0)
    print(f"prime {time.time()-t0:.1f}s", file=sys.stderr, flush=True)

    best, res, timings = float("inf"), None, []
    for rep in range(args.repeats):
        t0 = time.time()
        r = run(1 + rep)
        el = time.time() - t0
        timings.append(round(el, 2))
        print(f"rep{rep} {el:.2f}s", file=sys.stderr, flush=True)
        if el < best:
            best, res = el, r

    d = res.diagnostics
    g = evaluate_gamma(res, gt_tau)
    rmse = float(np.sqrt(np.mean((g.mean(0) - gt_g) ** 2)))
    per = np.sqrt(np.mean((g - gt_g[None, :]) ** 2, axis=1))
    p90 = float(np.percentile(per, 90))
    cov = float(np.mean((gt_g[None, :] >= d["gamma_eval_lo"])
                        & (gt_g[None, :] <= d["gamma_eval_hi"])))
    spm = args.b / (best / 60.0)
    vs = spm / (60.0 / BASELINE_SEC_PER_SPECTRUM)
    print(f"north-star 4x({args.warmup}+{args.samples}) B={args.b} "
          f"n{args.n_steps}{' traj_store' if args.traj_store else ''}: "
          f"best={best:.2f}s timings={timings} spm={spm:.0f} "
          f"vs_unscaled_baseline={vs:.0f}x "
          f"rmse={100*rmse/rp:.2f}%Rp p90={100*p90/rp:.2f}%Rp cov={cov:.3f} "
          f"minESS(med)={float(np.median(d['min_ess'])):.1f} "
          f"essBulkMin(med)={float(np.median(d['ess_bulk_min'])):.1f} "
          f"ess/sec={float(np.sum(d['min_ess']) / best):.0f} "
          f"div={float(d['divergence_rate'].mean()):.3f} "
          f"lpR(med)={float(np.median(d['logp_rhat'])):.2f} "
          f"rankRhat(med)={float(np.median(d['rank_rhat_max'])):.2f}",
          flush=True)


if __name__ == "__main__":
    main()
