"""A/B: generic shmc leaf-scan vs the fused Pallas trajectory kernel.

Back-to-back in ONE process (tunnel throughput drifts ±25% across sessions;
CLAUDE.md protocol), repeating the baseline at the end. Run on the TPU:

    python benchmarks/ab_pallas.py [B] [n_steps] [warmup] [samples]

Reports spectra/min + the bench quality gates for both paths.
"""

import os
import sys
import time

import numpy as np
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_compile_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

    from bayes_drt_tpu import sim
    from bayes_drt_tpu.infer.chees import SHMCConfig
    from bayes_drt_tpu.parallel import evaluate_gamma, fit_spectra_batch

    B = int(sys.argv[1]) if len(sys.argv) > 1 else 512
    n_steps = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    warmup = int(sys.argv[3]) if len(sys.argv) > 3 else 150
    samples = int(sys.argv[4]) if len(sys.argv) > 4 else 250
    chains = 4

    freq, Zb = sim.make_benchmark_batch(B, circuit="ZARC",
                                        noise_level=0.0025, seed=0)
    gt = pd.read_csv("/root/reference/data/simulated/gamma_ZARC.csv")
    gt_tau, gt_g = gt["tau"].values, gt["gamma"].values
    rp = np.trapezoid(gt_g, np.log(gt_tau))

    def run(tag, cfg, seed):
        t0 = time.time()
        res = fit_spectra_batch(freq, Zb, mode="sample", chains=chains,
                                warmup=warmup, samples=samples,
                                random_seed=seed, ncp=True, sampler="shmc",
                                shmc_cfg=cfg, gamma_eval_tau=gt_tau)
        el = time.time() - t0
        d = res.diagnostics
        g = evaluate_gamma(res, gt_tau)
        rmse = float(np.sqrt(np.mean((g.mean(axis=0) - gt_g) ** 2)))
        per = np.sqrt(np.mean((g - gt_g[None, :]) ** 2, axis=1))
        cov = float(np.mean((gt_g[None, :] >= d["gamma_eval_lo"])
                            & (gt_g[None, :] <= d["gamma_eval_hi"])))
        print(f"{tag}: {el:7.2f}s  {B / (el / 60):8.0f} spm  "
              f"rmse/Rp {rmse / rp:.4f}  p90 {np.percentile(per, 90) / rp:.4f}  "
              f"cov {cov:.3f}  lpR {np.median(d['logp_rhat']):.2f}  "
              f"minESS {np.median(d['min_ess']):.1f}  "
              f"div {d['divergence_rate'].mean():.3f}", flush=True)
        return el

    base = SHMCConfig(n_steps=n_steps, warm_steps=n_steps, leaf_unroll=2,
                      draw_unroll=2, recompute_grad=True, eps_quantile=0.5)
    fused = base._replace(pallas_traj=True, leaf_unroll=1, draw_unroll=1,
                          recompute_grad=False)
    flat = base._replace(flat_chain=True, recompute_grad=False)

    arms = {"base": base, "flat": flat}
    if "--fused" in sys.argv:
        arms["fused"] = fused

    print(f"B={B} chains={chains} n_steps={n_steps} "
          f"warmup={warmup} samples={samples}", flush=True)
    # warm all programs (compile), then timed best-of-2 interleaved
    for tag, cfg in arms.items():
        run(f"{tag} warm ", cfg, 0)
    for rep in range(2):
        for tag, cfg in arms.items():
            run(f"{tag}  r{rep} ", cfg, 1 + rep)
    run("base  tail ", base, 9)


if __name__ == "__main__":
    main()
