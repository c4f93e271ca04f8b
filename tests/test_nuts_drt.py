"""End-to-end NUTS sampling of the hierarchical DRT posterior, validated
against the reference's committed Stan sampling results
(code_EchemActa/bayes_results/Gout_*.csv)."""

import numpy as np
import pandas as pd

import jax
import jax.numpy as jnp
from jax.flatten_util import ravel_pytree

from bayes_drt_tpu.models.posterior import constrain, init_unconstrained, log_density
from bayes_drt_tpu.infer.nuts import sample_nuts

from test_posterior_map import series_setup


def test_hmc_zarc_matches_reference_posterior():
    cfg, data, aux = series_setup("Z_ZARC_Macdonald_0.25.csv", mode="sample")
    p0 = init_unconstrained(cfg, data, jax.random.PRNGKey(0))
    _, unravel = ravel_pytree(p0)
    logp = lambda q: log_density(cfg, data, unravel(q), jacobian=True)

    def chain(key):
        k1, k2 = jax.random.split(key)
        q0, _ = ravel_pytree(init_unconstrained(cfg, data, k1))
        return sample_nuts(logp, q0, k2, warmup=150, samples=150)

    keys = jax.random.split(jax.random.PRNGKey(1234), 2)
    draws, info = jax.vmap(chain)(keys)
    draws = np.asarray(draws).reshape(-1, np.asarray(draws).shape[-1])

    assert np.asarray(info["diverging"]).mean() < 0.25
    assert 0.6 < np.asarray(info["accept_prob"]).mean() <= 1.0

    xs = np.array([np.asarray(constrain(cfg, data, unravel(jnp.asarray(d)))["x_0"])
                   for d in draws]) * aux["z_scale"]

    ref = pd.read_csv(
        "/root/reference/code_EchemActa/bayes_results/Gout_ZARC_Macdonald_0.25.csv")
    Phi = np.exp(-((aux["eps"] * np.log(ref["tau"].values[:, None]
                                        / aux["tau"][None, :])) ** 2))
    gammas = xs @ Phi.T
    gm = gammas.mean(axis=0)
    rp = np.trapezoid(ref["gamma"].values, np.log(ref["tau"].values))

    # posterior mean must match the committed Stan posterior mean to ~1e-2
    rmse = np.sqrt(np.mean((gm - ref["gamma"].values) ** 2))
    assert rmse < 0.02 * rp, f"gamma RMSE vs Stan reference: {rmse} (Rp={rp})"

    # credible interval width should be the same order as the reference's
    glo = np.percentile(gammas, 2.5, axis=0)
    ghi = np.percentile(gammas, 97.5, axis=0)
    width = np.mean(ghi - glo)
    ref_width = np.mean(ref["gamma_hi"].values - ref["gamma_lo"].values)
    assert 0.3 * ref_width < width < 3.0 * ref_width, (width, ref_width)


def test_hmc_tp_ddt_matches_reference_posterior():
    """Parallel-model-family sampling path (stiff admittance-inversion
    likelihood) against the reference's committed Stan posterior."""
    import pandas as pd
    from bayes_drt_tpu import Inverter

    df = pd.read_csv("/root/reference/data/simulated/Z_BimodalTP-DDT_uniform_0.05.csv")
    freq = df["Freq"].values
    Z = df["Zreal"].values + 1j * df["Zimag"].values
    inv = Inverter(distributions={
        "DDT": {"kernel": "DDT", "symmetry": "planar", "bc": "transmissive",
                "dist_type": "parallel", "basis_freq": np.logspace(6, -3, 91)}})
    inv.fit(freq, Z, mode="sample", warmup=150, samples=150, chains=2,
            random_seed=3, max_tree_depth=9)
    ref = pd.read_csv("/root/reference/code_EchemActa/bayes_results/"
                      "Gout_BimodalTP-DDT_uniform_0.05.csv")
    gm = inv.predict_distribution("DDT", eval_tau=ref["tau"].values)
    scale = np.max(np.abs(ref["gamma"].values))
    rmse = np.sqrt(np.mean((gm - ref["gamma"].values) ** 2))
    assert rmse < 0.15 * scale, rmse
    # credible interval widths the same order as the reference's
    glo = inv.predict_distribution("DDT", eval_tau=ref["tau"].values,
                                   percentile=2.5)
    ghi = inv.predict_distribution("DDT", eval_tau=ref["tau"].values,
                                   percentile=97.5)
    w_ref = np.mean(ref["gamma_hi"].values - ref["gamma_lo"].values)
    assert 0.3 * w_ref < np.mean(ghi - glo) < 3.0 * w_ref


def test_credible_interval_calibration():
    """95% CIs must not under-cover the true distribution across a batch of
    noisy replicas (calibration of the whole batched-HMC pipeline)."""
    import pandas as pd
    from bayes_drt_tpu import sim
    from bayes_drt_tpu.parallel import evaluate_gamma, fit_spectra_batch

    freq, zb = sim.make_benchmark_batch(8, circuit="ZARC",
                                        noise_level=0.0025, seed=7)
    res = fit_spectra_batch(freq, zb, mode="sample", chains=2, warmup=150,
                            samples=150, max_tree_depth=8, random_seed=11)
    gt = pd.read_csv("/root/reference/data/simulated/gamma_ZARC.csv")
    tau = gt["tau"].values
    band = (tau > 1e-6) & (tau < 1e-1)
    glo = evaluate_gamma(res, tau, "lo")[:, band]
    ghi = evaluate_gamma(res, tau, "hi")[:, band]
    truth = gt["gamma"].values[band][None, :]
    coverage = ((truth >= glo) & (truth <= ghi)).mean()
    assert coverage > 0.85, coverage
