"""The flat (hand-written) single-series-DRT value-and-grad and the fused
trajectory path must reproduce the generic posterior machinery exactly.

The hand-written gradient is the load-bearing piece of the Pallas trajectory
kernel (infer/shmc_flat.py): any algebra slip shows up here as a mismatch
against jax.value_and_grad of models/posterior.log_density."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.flatten_util import ravel_pytree

from bayes_drt_tpu import sim
from bayes_drt_tpu.infer.shmc_flat import (flat_shared_for, flat_spec_for,
                                           flat_value_and_grad)
from bayes_drt_tpu.models.posterior import init_unconstrained, log_density
from bayes_drt_tpu.parallel.batch import _build_shared


def _setup(ncp, nonneg, dtype=jnp.float64):
    freq = np.logspace(6, -2, 41)
    Z = sim.reference_circuit("ZARC", freq)
    _, _, _, cfg, data, _ = _build_shared(freq, mode="sample", ncp=ncp,
                                          nonneg=nonneg, dtype=dtype)
    zs = np.abs(Z).max()
    target = jnp.asarray(np.concatenate([Z.real, Z.imag]) / zs, dtype)
    data = data._replace(target=target)
    return cfg, data, target


@pytest.mark.parametrize("ncp,nonneg", [(True, False), (False, False),
                                        (True, True), (False, True)])
def test_flat_value_and_grad_matches_generic(ncp, nonneg):
    cfg, data, target = _setup(ncp, nonneg)
    spec = flat_spec_for(cfg, data)
    shared = flat_shared_for(cfg, data, jnp.float64)

    key = jax.random.PRNGKey(3)
    R = 5
    q_rows = []
    for i in range(R):
        p = init_unconstrained(cfg, data, jax.random.fold_in(key, i))
        q_rows.append(ravel_pytree(
            jax.tree.map(lambda a: a.astype(jnp.float64), p))[0])
    q2d = jnp.stack(q_rows)
    targets = jnp.broadcast_to(target[None, :], (R, target.shape[0]))

    lp_flat, g_flat = flat_value_and_grad(spec, shared.A, shared.L,
                                          shared.vecs, shared.scal,
                                          q2d, targets)

    _, unravel = ravel_pytree(init_unconstrained(cfg, data,
                                                 jax.random.PRNGKey(0)))
    vg = jax.vmap(jax.value_and_grad(
        lambda q: log_density(cfg, data, unravel(q), jacobian=True)))
    lp_ref, g_ref = vg(q2d)

    np.testing.assert_allclose(np.asarray(lp_flat), np.asarray(lp_ref),
                               rtol=1e-10, atol=1e-9)
    np.testing.assert_allclose(np.asarray(g_flat), np.asarray(g_ref),
                               rtol=1e-9, atol=1e-9)


def test_flat_spec_rejects_ineligible_models():
    freq = np.logspace(6, -2, 21)
    _, _, _, cfg, data, _ = _build_shared(freq, mode="sample",
                                          outliers=True)
    with pytest.raises(ValueError, match="single series"):
        flat_spec_for(cfg, data)


def test_pallas_traj_matches_xla_traj_interpret():
    """The fused kernel (interpret mode) and the XLA scan reference must
    produce identical trajectories — same math, same selection."""
    from bayes_drt_tpu.infer.shmc_flat import (_traj_pallas, _traj_xla,
                                               flat_shared_for, flat_spec_for)

    cfg, data, target = _setup(ncp=True, nonneg=False, dtype=jnp.float32)
    spec = flat_spec_for(cfg, data)
    shared = flat_shared_for(cfg, data, jnp.float32)
    rt, D = 8, spec.D
    key = jax.random.PRNGKey(0)
    q_rows = []
    for i in range(rt):
        p = init_unconstrained(cfg, data, jax.random.fold_in(key, i))
        q_rows.append(ravel_pytree(
            jax.tree.map(lambda a: a.astype(jnp.float32), p))[0])
    q = jnp.stack(q_rows)
    targets = jnp.broadcast_to(target.astype(jnp.float32)[None, :],
                               (rt, target.shape[0]))
    lp, g = flat_value_and_grad(spec, shared.A, shared.L, shared.vecs,
                                shared.scal, q, targets)
    k1, k2, k3 = jax.random.split(key, 3)
    m_inv = jnp.ones((rt, D), jnp.float32)
    p0 = jax.random.normal(k1, (rt, D), jnp.float32)
    eps = jnp.exp(jax.random.uniform(k2, (rt,), jnp.float32,
                                     minval=-6.0, maxval=-4.0))
    n_leap = 6
    u_sel = jax.random.uniform(k3, (n_leap, rt), jnp.float32)
    j = jnp.asarray(2, jnp.int32)

    args = (shared, q, p0, g, lp, eps, m_inv, targets, j, u_sel)
    out_x = _traj_xla(spec, n_leap, 1000.0, *args)
    out_p = _traj_pallas(spec, n_leap, 1000.0, 8, True, *args)
    names = ["q", "logp", "grad", "kin", "sacc", "diverging"]
    for name, a, b in zip(names, out_x, out_p):
        np.testing.assert_allclose(np.asarray(a, np.float32),
                                   np.asarray(b, np.float32),
                                   rtol=2e-5, atol=2e-5, err_msg=name)


def test_fit_spectra_batch_pallas_traj_end_to_end():
    """fit_spectra_batch(sampler='shmc', pallas_traj=True) recovers the ZARC
    distribution (interpret mode off-TPU) with the standard diagnostics."""
    from bayes_drt_tpu.infer.chees import SHMCConfig
    from bayes_drt_tpu.parallel import fit_spectra_batch

    from bayes_drt_tpu import sim
    freq, Zb = sim.make_benchmark_batch(4, freq=np.logspace(5, -1, 31),
                                        noise_level=0.003, seed=3)
    cfg = SHMCConfig(n_steps=8, warm_steps=8, eps_quantile=0.5,
                     pallas_traj=True, traj_block=16)
    res = fit_spectra_batch(freq, Zb, mode="sample", chains=2, warmup=60,
                            samples=40, random_seed=0, ncp=True,
                            sampler="shmc", shmc_cfg=cfg,
                            dtype=np.float32)
    assert res.coef.shape == (4, len(res.tau))
    assert np.isfinite(res.coef).all()
    d = res.diagnostics
    assert np.isfinite(d["logp_rhat"]).all()
    assert (d["accept_prob"] > 0.2).all()
    # recovered distribution must track the ZARC ground truth
    import pandas as pd

    from bayes_drt_tpu.parallel import evaluate_gamma
    gt = pd.read_csv("/root/reference/data/simulated/gamma_ZARC.csv")
    g = evaluate_gamma(res, gt["tau"].values)
    rp = np.trapezoid(gt["gamma"].values, np.log(gt["tau"].values))
    rmse = np.sqrt(np.mean((g - gt["gamma"].values[None, :]) ** 2, axis=1))
    assert (rmse < 0.15 * rp).all(), rmse


def test_fit_spectra_batch_flat_chain_matches_pallas_traj():
    """flat_chain=True (XLA scan over the same flat (B*C, D) layout) must
    produce bit-identical draws to pallas_traj in interpret mode — the two
    trajectory impls share everything but the launch."""
    from bayes_drt_tpu.infer.chees import SHMCConfig
    from bayes_drt_tpu.parallel import fit_spectra_batch

    from bayes_drt_tpu import sim
    freq, Zb = sim.make_benchmark_batch(2, freq=np.logspace(5, -1, 21),
                                        noise_level=0.003, seed=5)
    common = dict(n_steps=6, warm_steps=6, eps_quantile=0.5)
    kw = dict(mode="sample", chains=2, warmup=30, samples=20, random_seed=0,
              ncp=True, sampler="shmc", dtype=np.float32)
    res_p = fit_spectra_batch(freq, Zb, shmc_cfg=SHMCConfig(
        pallas_traj=True, traj_block=8, **common), **kw)
    res_f = fit_spectra_batch(freq, Zb, shmc_cfg=SHMCConfig(
        flat_chain=True, **common), **kw)
    np.testing.assert_allclose(res_f.coef, res_p.coef, rtol=2e-4, atol=2e-5)
    assert np.isfinite(res_f.diagnostics["logp_rhat"]).all()


def test_fit_spectra_batch_pallas_traj_rejects_unsupported():
    from bayes_drt_tpu.infer.chees import SHMCConfig
    from bayes_drt_tpu.parallel import fit_spectra_batch

    from bayes_drt_tpu import sim
    freq, Zb = sim.make_benchmark_batch(2, freq=np.logspace(5, -1, 21),
                                        noise_level=0.003, seed=0)
    cfg = SHMCConfig(n_steps=4, pallas_traj=True)
    with pytest.raises(ValueError, match="single series"):
        fit_spectra_batch(freq, Zb, mode="sample", chains=2, warmup=10,
                          samples=10, sampler="shmc", shmc_cfg=cfg,
                          outliers=True, dtype=np.float32)
