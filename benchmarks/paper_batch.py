"""Full paper-batch regression sweep: every single-DRT simulated case the
reference committed results for (code_EchemActa/map_results/Gout_*.csv and
bayes_results/Gout_*.csv), MAP + HMC, against both the ground-truth gamma
and the reference's own committed recovery.

Cases: {RC, 2RC, ZARC, 2ZARC, Gerischer, ZARC-RL} x {noiseless,
uniform/Macdonald/Orazem x 0.25/1.0/2.5} on the 81-point grid, plus
RC-ZARC (41-pt) and trunc (53-pt) — 80 spectra, grouped by (frequency
grid, model config) and fit as ONE batched program per group. Model
configs (basis_freq / nonneg / sigma_min) reproduce the committed
notebook per circuit — see BASIS_FREQ/NONNEG/circuit_config below.

Gates (per spectrum):
- truth exists (ZARC-family/Gerischer/trunc): our truth-RMSE must be within
  1.5x the reference's committed truth-RMSE + 0.02*Rp (the standard used by
  tests/test_reference_regression.py).
- no continuous truth (RC, 2RC are delta distributions): report
  agreement-with-reference RMSE; gate at 0.10*Rp (both frameworks smooth
  deltas through the same RBF basis, so their smoothed forms must agree).

Writes benchmarks/results/paper_batch.csv and prints a summary table.
Usage: python benchmarks/paper_batch.py [--modes map hmc]

Remedy arms for the sharply-peaked (delta-like) 2RC family, whose
posterior has a slow mixing direction needing 4-8x the production
trajectory (see benchmarks/probe_2rc.py):
  --circuits 2RC --warmup 500 --samples 500 --sampler nuts
    -> results/paper_batch_hmc_2rc_nuts.csv: 10/10 PASS (0.012-0.082 Rp)
  --circuits 2RC --warmup 500 --samples 500 --n-steps 128
    -> results/paper_batch_hmc_2rc_n128.csv: 8/10 at the production
       bf16x3 precision (f32 passes all three gated 0.25 cells — bf16x3
       costs ~0.01-0.02 Rp at the margin on this unusually sharp
       posterior).
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import pandas as pd

SIM = "/root/reference/data/simulated"
MAPR = "/root/reference/code_EchemActa/map_results"
BAYR = "/root/reference/code_EchemActa/bayes_results"

CIRCUITS = ["RC", "2RC", "ZARC", "2ZARC", "Gerischer", "ZARC-RL",
            "RC-ZARC", "trunc"]
NOISES = (["noiseless"]
          + [f"{k}_{v}" for k in ("uniform", "Macdonald", "Orazem")
             for v in ("0.25", "1.0", "2.5")])
TRUTH = {"ZARC": "gamma_ZARC.csv", "2ZARC": "gamma_2ZARC.csv",
         "Gerischer": "gamma_Gerischer.csv", "ZARC-RL": "gamma_ZARC-RL.csv",
         "RC-ZARC": "gamma_RC-ZARC.csv", "trunc": "gamma_trunc.csv"}

# Per-circuit model configs from the committed "Run fits.ipynb":
# - main loop (cells 3-5): default basis, nonneg_drt=True EXCEPT ZARC-RL
#   (its inductive lobe is genuinely negative), sigma_min=0.005 noiseless /
#   0.002 noisy (both modes);
# - RC-ZARC (cells 8-10): dedicated basis_tau=logspace(-2,3,51),
#   nonneg=True; the HMC cell hardcodes sigma_min=0.002 for every noise
#   level (the noiseless branch is commented out in cell 10);
# - trunc (cells 12-14): basis_freq=logspace(6,-2,81) extending 1.7 decades
#   past the truncated measurement window (the unresolved low-frequency
#   ZARC tail needs out-of-window basis mass), nonneg=False.
# Fitting these with library defaults instead (rounds 2-4) left RC-ZARC
# multimodal in the R_inf<->fast-lobe split and trunc unable to express
# the tail => posterior-predictive-Z disagreements vs the committed Zout.
BASIS_FREQ = {"RC-ZARC": 1.0 / (2 * np.pi * np.logspace(-2, 3, 51)),
              "trunc": np.logspace(6, -2, 81)}
NONNEG = {"ZARC-RL": False, "trunc": False}


def circuit_config(circuit, noise, mode):
    sig = 0.005 if noise == "noiseless" else 0.002
    if circuit == "RC-ZARC" and mode != "map":
        sig = 0.002
    return dict(nonneg=NONNEG.get(circuit, True), sigma_min=sig,
                basis_key=circuit if circuit in BASIS_FREQ else None)


def load_cases():
    cases = []
    for c in CIRCUITS:
        for nz in NOISES:
            zf = f"{SIM}/Z_{c}_{nz}.csv"
            if not os.path.exists(zf):
                continue
            cases.append({"circuit": c, "noise": nz, "z_file": zf,
                          "name": f"{c}_{nz}"})
    return cases


def run_group(cases, mode, chains=4, warmup=150, samples=250, n_steps=32,
              sampler="shmc", precision="high", escalate=False,
              max_tree_depth=8):
    """One batched fit over cases sharing a frequency grid."""
    from bayes_drt_tpu.infer.chees import SHMCConfig
    from bayes_drt_tpu.parallel import evaluate_gamma as eg
    from bayes_drt_tpu.parallel import fit_spectra_batch, predict_Z_batch

    dfs = [pd.read_csv(c["z_file"]) for c in cases]
    freq = dfs[0]["Freq"].values
    zb = np.stack([d["Zreal"].values + 1j * d["Zimag"].values for d in dfs])
    cc = circuit_config(cases[0]["circuit"], cases[0]["noise"], mode)
    for c in cases[1:]:
        assert circuit_config(c["circuit"], c["noise"], mode) == cc, \
            "model-config mismatch within group"
    kw = dict(nonneg=cc["nonneg"], sigma_min=cc["sigma_min"],
              basis_freq=BASIS_FREQ.get(cc["basis_key"]), random_seed=0)
    t0 = time.time()
    if mode == "map":
        res = fit_spectra_batch(freq, zb, mode="optimize", max_iter=1500,
                                init_from_ridge=True, **kw)
    elif sampler == "nuts":
        # dynamic trajectories (<=255 leaves at md8): the remedy arm for
        # sharply-peaked (delta-like) spectra — see benchmarks/probe_2rc.py
        res = fit_spectra_batch(freq, zb, mode="sample", chains=chains,
                                warmup=warmup, samples=samples,
                                ncp=True, sampler="nuts",
                                tree_scan=True, scan_unroll=2,
                                max_tree_depth=max_tree_depth,
                                escalate=None if escalate else False, **kw)
    else:
        res = fit_spectra_batch(
            freq, zb, mode="sample", chains=chains, warmup=warmup,
            samples=samples, ncp=True, sampler="shmc",
            shmc_cfg=SHMCConfig(n_steps=n_steps, warm_steps=n_steps,
                                leaf_unroll=2, draw_unroll=2,
                                recompute_grad=True, eps_quantile=0.5,
                                precision=precision),
            escalate=None if escalate else False, **kw)
    el = time.time() - t0
    print(f"  group[{len(cases)}x{len(freq)}pt] {mode}: {el:.1f}s",
          file=sys.stderr, flush=True)

    # reference tau grids differ per file, so evaluate per case
    out = []
    for i, c in enumerate(cases):
        ref_dir = MAPR if mode == "map" else BAYR
        ref_file = f"{ref_dir}/Gout_{c['name']}.csv"
        row = {"case": c["name"], "mode": mode, "n_freq": len(freq),
               "group_seconds": round(el, 1)}
        if not os.path.exists(ref_file):
            row["status"] = "no-reference"
            out.append(row)
            continue
        ref = pd.read_csv(ref_file)
        tau_ref = ref["tau"].values
        g_ref = ref["gamma"].values
        g_us = eg(res, tau_ref)[i]
        rp = max(abs(float(np.trapezoid(g_ref, np.log(tau_ref)))),
                 float(np.max(np.abs(g_ref))), 1e-12)
        row["rmse_vs_ref"] = float(np.sqrt(np.mean((g_us - g_ref) ** 2))) / rp
        truth_f = TRUTH.get(c["circuit"])
        if truth_f:
            gt = pd.read_csv(f"{SIM}/{truth_f}")
            g_us_t = eg(res, gt["tau"].values)[i]
            # reference gamma interpolated onto the truth grid (log-tau)
            g_ref_t = np.interp(np.log(gt["tau"].values), np.log(tau_ref),
                                g_ref)
            rmse_us = float(np.sqrt(np.mean((g_us_t - gt["gamma"].values) ** 2)))
            rmse_ref = float(np.sqrt(np.mean((g_ref_t - gt["gamma"].values) ** 2)))
            row["rmse_truth_us"] = rmse_us / rp
            row["rmse_truth_ref"] = rmse_ref / rp
            ok = rmse_us <= 1.5 * rmse_ref + 0.02 * rp
            row["gate"] = "truth<=1.5xref+0.02Rp"
        else:
            ok = row["rmse_vs_ref"] <= 0.10
            row["gate"] = "vs_ref<=0.10Rp"
        # posterior-predictive impedance vs the committed Zout (Stan
        # generated quantities, Series_modelcode.txt:70-73). Two-tier gate:
        # match Stan's Z_hat pointwise (z_dev) OR — on the truncated /
        # high-noise cells where the posterior-mean Z is not identified by
        # the data and the two samplers legitimately weight the R_inf<->
        # gamma-tail ridge differently — fit the OBSERVED data at least as
        # well as Stan's own Z_hat does (z_fit parity; Stan's median
        # fit-residual on e.g. RC-ZARC_Orazem_2.5 is itself 4.8%).
        zout_file = f"{ref_dir}/Zout_{c['name']}.csv"
        if os.path.exists(zout_file):
            zr = pd.read_csv(zout_file)
            z_ref = zr["Zreal"].values + 1j * zr["Zimag"].values
            z_us = predict_Z_batch(res, zr["freq"].values)[i]
            z_dev = float(np.median(np.abs(z_us - z_ref) / np.abs(z_ref)))
            row["z_dev"] = z_dev
            zd = pd.read_csv(c["z_file"])
            m = pd.merge(zd, zr, left_on="Freq", right_on="freq",
                         suffixes=("_d", "_r"))
            z_data = m["Zreal_d"].values + 1j * m["Zimag_d"].values
            zh_ref = m["Zreal_r"].values + 1j * m["Zimag_r"].values
            z_us_d = predict_Z_batch(res, m["Freq"].values)[i]
            z_fit_us = float(np.median(np.abs(z_us_d - z_data)
                                       / np.abs(z_data)))
            z_fit_ref = float(np.median(np.abs(zh_ref - z_data)
                                        / np.abs(z_data)))
            row["z_fit_us"] = z_fit_us
            row["z_fit_ref"] = z_fit_ref
            ok = ok and (z_dev <= 0.02
                         or z_fit_us <= max(1.25 * z_fit_ref,
                                            z_fit_ref + 0.005))
        if mode == "map":
            row["grad_norm"] = float(res.diagnostics["grad_norm"][i])
            row["converged"] = bool(res.diagnostics["converged"][i])
        else:
            row["logp_rhat"] = float(res.diagnostics["logp_rhat"][i])
            row["divergence_rate"] = float(
                res.diagnostics["divergence_rate"][i])
            for k in ("ess_bulk_min", "rank_rhat_max", "min_ess",
                      "bf16x3_grad_err", "metric_lambda_max"):
                if k in res.diagnostics:
                    row[k] = float(np.asarray(res.diagnostics[k])[i])
            # trajectory-length-vs-posterior-scale calibration signals:
            # eps_med = the (median-pooled) sampling step size; sigma_max =
            # the widest adapted posterior scale sqrt(max inv_mass). A fixed
            # n_steps trajectory shorter than sigma_max random-walks the
            # slow direction (the 2RC failure mechanism).
            eps = np.asarray(res.diagnostics["state_step_size"])[i]
            im = np.asarray(res.diagnostics["state_inv_mass"])[i]
            row["eps_med"] = float(np.median(eps))
            row["sigma_max"] = float(np.sqrt(im.max()))
            row["traj_ratio"] = (n_steps * row["eps_med"] / row["sigma_max"]
                                 if mode != "map" else np.nan)
            row["r_inf"] = float(res.r_inf[i])
            row["induc"] = float(res.inductance[i])
        row["status"] = "PASS" if ok else "FAIL"
        out.append(row)
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--modes", nargs="+", default=["map", "hmc"])
    ap.add_argument("--warmup", type=int, default=150)
    ap.add_argument("--samples", type=int, default=250)
    ap.add_argument("--circuits", nargs="+", default=None,
                    help="restrict to these circuit families")
    ap.add_argument("--n-steps", type=int, default=32,
                    help="SHMC leapfrogs/draw (sharply-peaked spectra need "
                         "~128; see benchmarks/probe_2rc.py)")
    ap.add_argument("--sampler", default="shmc", choices=["shmc", "nuts"],
                    help="'nuts' = dynamic trajectories (md8), the remedy "
                         "arm for delta-like spectra")
    ap.add_argument("--max-tree-depth", type=int, default=8,
                    help="NUTS cap; Stan's default is 10")
    ap.add_argument("--precision", default="high",
                    choices=["high", "highest"],
                    help="SHMC matmul precision (bf16x3 vs true f32)")
    ap.add_argument("--escalate", action="store_true",
                    help="let fit_spectra_batch's DEFAULT mixing-gate "
                         "escalation run (off pins escalate=False so the "
                         "raw sampler is measured for gate calibration)")
    ap.add_argument("--out", default="paper_batch.csv")
    args = ap.parse_args()

    import jax
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_compile_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

    cases = load_cases()
    if args.circuits:
        cases = [c for c in cases if c["circuit"] in args.circuits]

    rows = []
    for mode in args.modes:
        # group by (grid, model config): one batched program per group.
        # sigma_min is a PosteriorData field (a traced argument), so groups
        # differing only in sigma_min reuse the same compiled program.
        groups = {}
        for c in cases:
            n = len(pd.read_csv(c["z_file"]))
            cc = circuit_config(c["circuit"], c["noise"], mode)
            key = (n, cc["nonneg"], cc["basis_key"], cc["sigma_min"])
            groups.setdefault(key, []).append(c)
        print(f"{mode}: {len(cases)} cases in {len(groups)} groups "
              f"({ {k: len(v) for k, v in groups.items()} })",
              file=sys.stderr, flush=True)
        for key, grp in sorted(groups.items(), key=str):
            rows.extend(run_group(grp, mode, warmup=args.warmup,
                                  samples=args.samples,
                                  n_steps=args.n_steps,
                                  sampler=args.sampler,
                                  precision=args.precision,
                                  escalate=args.escalate,
                                  max_tree_depth=args.max_tree_depth))

    df = pd.DataFrame(rows)
    os.makedirs(os.path.join(os.path.dirname(__file__), "results"),
                exist_ok=True)
    out_path = os.path.join(os.path.dirname(__file__), "results", args.out)
    df.to_csv(out_path, index=False)
    n_pass = int((df["status"] == "PASS").sum())
    n_fail = int((df["status"] == "FAIL").sum())
    print(df.to_string(index=False, float_format=lambda v: f"{v:.4f}"))
    print(f"\nsummary: {n_pass} PASS / {n_fail} FAIL "
          f"/ {len(df) - n_pass - n_fail} no-reference -> {out_path}")


if __name__ == "__main__":
    main()
