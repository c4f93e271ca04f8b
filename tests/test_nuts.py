import numpy as np
import pytest

import jax
import jax.numpy as jnp

from bayes_drt_tpu.infer.nuts import NUTSConfig, sample_nuts


def test_correlated_gaussian_moments():
    """NUTS must recover mean/cov of a correlated Gaussian within MC error."""
    d = 8
    rng = np.random.default_rng(3)
    A = rng.standard_normal((d, d))
    cov = A @ A.T + d * np.eye(d)
    prec = jnp.asarray(np.linalg.inv(cov))
    mu = jnp.asarray(rng.standard_normal(d))

    def logp(q):
        r = q - mu
        return -0.5 * r @ (prec @ r)

    n_chains = 4
    keys = jax.random.split(jax.random.PRNGKey(0), n_chains)
    q0s = jax.vmap(lambda k: jax.random.normal(k, (d,)))(keys)
    draws, info = jax.vmap(
        lambda q0, k: sample_nuts(logp, q0, k, warmup=500, samples=1000)
    )(q0s, keys)
    draws = np.asarray(draws).reshape(-1, d)

    assert np.asarray(info["diverging"]).mean() < 0.01
    est_mu = draws.mean(axis=0)
    est_cov = np.cov(draws.T)
    sd = np.sqrt(np.diag(cov))
    # means within ~5 MC standard errors (ESS conservatively ~ n/10)
    mc_err = sd / np.sqrt(len(draws) / 10)
    assert np.all(np.abs(est_mu - np.asarray(mu)) < 5 * mc_err), (
        est_mu - np.asarray(mu), mc_err)
    # covariance diagonal within 20%
    np.testing.assert_allclose(np.diag(est_cov), np.diag(cov), rtol=0.2)
    # full covariance reasonably close in Frobenius norm
    rel_f = np.linalg.norm(est_cov - cov) / np.linalg.norm(cov)
    assert rel_f < 0.25, rel_f


def test_noncentered_scales():
    """Heteroscedastic independent Gaussian: mass adaptation must handle
    scales spanning 4 orders of magnitude."""
    scales = jnp.asarray([1e-2, 1e-1, 1.0, 10.0, 100.0])

    def logp(q):
        return -0.5 * jnp.sum((q / scales) ** 2)

    draws, info = sample_nuts(logp, jnp.zeros(5), jax.random.PRNGKey(1),
                              warmup=600, samples=1500)
    draws = np.asarray(draws)
    est_sd = draws.std(axis=0)
    np.testing.assert_allclose(est_sd, np.asarray(scales), rtol=0.25)
    assert np.asarray(info["diverging"]).mean() < 0.01


def test_accept_rate_near_target():
    def logp(q):
        return -0.5 * jnp.sum(q**2)

    draws, info = sample_nuts(logp, jnp.zeros(3), jax.random.PRNGKey(2),
                              warmup=400, samples=400)
    acc = float(np.asarray(info["accept_prob"]).mean())
    assert 0.75 < acc <= 1.0, acc


def test_deterministic_given_key():
    def logp(q):
        return -0.5 * jnp.sum(q**2)

    d1, _ = sample_nuts(logp, jnp.zeros(2), jax.random.PRNGKey(7),
                        warmup=50, samples=50)
    d2, _ = sample_nuts(logp, jnp.zeros(2), jax.random.PRNGKey(7),
                        warmup=50, samples=50)
    np.testing.assert_array_equal(np.asarray(d1), np.asarray(d2))


def test_dense_mass_correlated_gaussian():
    """Dense metric handles strong correlations: moments recovered and
    trajectories much shorter than with the diagonal metric."""
    d = 6
    rng = np.random.default_rng(11)
    A = rng.standard_normal((d, d))
    cov = A @ A.T + 0.05 * np.eye(d)
    prec = jnp.asarray(np.linalg.inv(cov))

    def logp(q):
        return -0.5 * q @ (prec @ q)

    cfg_dense = NUTSConfig(dense_mass=True)
    draws, info = sample_nuts(logp, jnp.zeros(d), jax.random.PRNGKey(4),
                              warmup=600, samples=1200, cfg=cfg_dense)
    draws = np.asarray(draws)
    est_cov = np.cov(draws.T)
    rel_f = np.linalg.norm(est_cov - cov) / np.linalg.norm(cov)
    assert rel_f < 0.3, rel_f

    draws2, info2 = sample_nuts(logp, jnp.zeros(d), jax.random.PRNGKey(4),
                                warmup=600, samples=1200)
    n_dense = float(np.asarray(info["n_leapfrog"]).mean())
    n_diag = float(np.asarray(info2["n_leapfrog"]).mean())
    assert n_dense < 0.7 * n_diag, (n_dense, n_diag)


def test_fixed_metric_step_size_only():
    """A precomputed dense metric with adapt_mass=False: trajectories
    collapse to near-isotropic lengths and moments stay correct."""
    d = 12
    rng = np.random.default_rng(5)
    A = rng.standard_normal((d, d))
    cov = A @ A.T + 0.05 * np.eye(d)
    prec = jnp.asarray(np.linalg.inv(cov))

    def logp(q):
        return -0.5 * q @ (prec @ q)

    chol = np.linalg.cholesky(cov)
    cfg = NUTSConfig(adapt_mass=False)
    draws, info = sample_nuts(logp, jnp.zeros(d), jax.random.PRNGKey(9),
                              warmup=150, samples=1000, cfg=cfg,
                              metric=(jnp.asarray(cov), jnp.asarray(chol)))
    draws = np.asarray(draws)
    est_cov = np.cov(draws.T)
    rel_f = np.linalg.norm(est_cov - cov) / np.linalg.norm(cov)
    assert rel_f < 0.3, rel_f
    # with the exact covariance as metric, the target is isotropic:
    # trajectories should be very short
    assert float(np.asarray(info["n_leapfrog"]).mean()) < 20

    # diagonal fixed metric variant: variance vector
    var = np.diag(cov).copy()
    draws2, info2 = sample_nuts(logp, jnp.zeros(d), jax.random.PRNGKey(9),
                                warmup=150, samples=500, cfg=cfg,
                                metric=jnp.asarray(var))
    assert float(np.asarray(info2["diverging"]).mean()) < 0.02


def test_unroll_is_semantics_preserving():
    """The unrolled tree builder must produce BIT-IDENTICAL draws to the
    unit-stride builder: unrolling only packs more leaves per loop
    iteration, with masked-out extra work at subtree boundaries."""
    d = 10
    rng = np.random.default_rng(2)
    A = rng.standard_normal((d, d))
    cov = A @ A.T + 0.5 * np.eye(d)
    prec = jnp.asarray(np.linalg.inv(cov))

    def logp(q):
        return -0.5 * q @ (prec @ q)

    d1, _ = sample_nuts(logp, jnp.zeros(d), jax.random.PRNGKey(0),
                        warmup=150, samples=150, cfg=NUTSConfig(max_depth=8))
    for u in (2, 4):
        du, _ = sample_nuts(logp, jnp.zeros(d), jax.random.PRNGKey(0),
                            warmup=150, samples=150,
                            cfg=NUTSConfig(max_depth=8, unroll=u))
        np.testing.assert_array_equal(np.asarray(du), np.asarray(d1))


def test_flat_tree_is_bit_identical():
    """The single-flat-loop transition must produce BIT-IDENTICAL draws to
    the nested doubling loops: same RNG stream, same leaf order, merge
    bookkeeping just runs masked inside one loop."""
    d = 10
    rng = np.random.default_rng(7)
    A = rng.standard_normal((d, d))
    cov = A @ A.T + 0.5 * np.eye(d)
    prec = jnp.asarray(np.linalg.inv(cov))

    def logp(q):
        return -0.5 * q @ (prec @ q)

    d1, i1 = sample_nuts(logp, jnp.zeros(d), jax.random.PRNGKey(0),
                         warmup=200, samples=200, cfg=NUTSConfig(max_depth=8))
    d2, i2 = sample_nuts(logp, jnp.zeros(d), jax.random.PRNGKey(0),
                         warmup=200, samples=200,
                         cfg=NUTSConfig(max_depth=8, flat_tree=True))
    np.testing.assert_array_equal(np.asarray(d2), np.asarray(d1))
    np.testing.assert_array_equal(np.asarray(i2["n_leapfrog"]),
                                  np.asarray(i1["n_leapfrog"]))


def test_fused_draws_matches_flat_tree():
    """The fused persistent-loop sampler (one while_loop per chain) must
    reproduce the flat_tree sampler: BIT-IDENTICAL draws when warmup=0 (no
    adaptation arithmetic), and with adaptation identical tree shapes with
    draws equal up to FP reassociation of the dual-averaging update (XLA
    fuses the step-size arithmetic differently in the two programs; the
    ulp-level difference grows chaotically with the trajectory)."""
    d = 10
    rng = np.random.default_rng(7)
    A = rng.standard_normal((d, d))
    cov = A @ A.T + 0.5 * np.eye(d)
    prec = jnp.asarray(np.linalg.inv(cov))

    def logp(q):
        return -0.5 * q @ (prec @ q)

    # no adaptation: bit-identical
    d1, i1 = sample_nuts(logp, jnp.ones(d), jax.random.PRNGKey(0),
                         warmup=0, samples=20,
                         cfg=NUTSConfig(max_depth=8, flat_tree=True))
    d2, i2 = sample_nuts(logp, jnp.ones(d), jax.random.PRNGKey(0),
                         warmup=0, samples=20,
                         cfg=NUTSConfig(max_depth=8, fused_draws=True))
    np.testing.assert_array_equal(np.asarray(d2), np.asarray(d1))
    np.testing.assert_array_equal(np.asarray(i2["n_leapfrog"]),
                                  np.asarray(i1["n_leapfrog"]))

    # with step-size + mass adaptation: same trees, draws to reassociation
    d1, i1 = sample_nuts(logp, jnp.zeros(d), jax.random.PRNGKey(3),
                         warmup=60, samples=60,
                         cfg=NUTSConfig(max_depth=8, flat_tree=True))
    d2, i2 = sample_nuts(logp, jnp.zeros(d), jax.random.PRNGKey(3),
                         warmup=60, samples=60,
                         cfg=NUTSConfig(max_depth=8, fused_draws=True))
    np.testing.assert_array_equal(np.asarray(i2["n_leapfrog"]),
                                  np.asarray(i1["n_leapfrog"]))
    np.testing.assert_array_equal(np.asarray(i2["diverging"]),
                                  np.asarray(i1["diverging"]))
    np.testing.assert_allclose(np.asarray(d2), np.asarray(d1),
                               rtol=1e-5, atol=1e-7)
    np.testing.assert_allclose(np.asarray(i2["inv_mass"]),
                               np.asarray(i1["inv_mass"]), rtol=1e-6)


def test_tree_scan_matches_flat_tree():
    """The static-length scan tree builder (tree_scan=True) must reproduce
    the while_loop flat builder bit-for-bit: identical RNG stream, identical
    tree shapes, identical draws — the alive mask freezes finished trees
    through the remaining scan iterations without touching their state."""
    d = 10
    rng = np.random.default_rng(11)
    A = rng.standard_normal((d, d))
    cov = A @ A.T + 0.5 * np.eye(d)
    prec = jnp.asarray(np.linalg.inv(cov))

    def logp(q):
        return -0.5 * q @ (prec @ q)

    d1, i1 = sample_nuts(logp, jnp.ones(d), jax.random.PRNGKey(5),
                         warmup=50, samples=50,
                         cfg=NUTSConfig(max_depth=6, flat_tree=True))
    d2, i2 = sample_nuts(logp, jnp.ones(d), jax.random.PRNGKey(5),
                         warmup=50, samples=50,
                         cfg=NUTSConfig(max_depth=6, tree_scan=True))
    np.testing.assert_array_equal(np.asarray(d2), np.asarray(d1))
    np.testing.assert_array_equal(np.asarray(i2["n_leapfrog"]),
                                  np.asarray(i1["n_leapfrog"]))
    np.testing.assert_array_equal(np.asarray(i2["diverging"]),
                                  np.asarray(i1["diverging"]))
    np.testing.assert_array_equal(np.asarray(i2["inv_mass"]),
                                  np.asarray(i1["inv_mass"]))


def test_tree_scan_unroll_matches():
    """scan_unroll inlines leaves per scan iteration without changing the
    algorithm: identical draws and tree shapes vs unroll=1."""
    d = 10
    rng = np.random.default_rng(13)
    A = rng.standard_normal((d, d))
    cov = A @ A.T + 0.5 * np.eye(d)
    prec = jnp.asarray(np.linalg.inv(cov))

    def logp(q):
        return -0.5 * q @ (prec @ q)

    d1, i1 = sample_nuts(logp, jnp.ones(d), jax.random.PRNGKey(9),
                         warmup=40, samples=40,
                         cfg=NUTSConfig(max_depth=5, tree_scan=True))
    d2, i2 = sample_nuts(logp, jnp.ones(d), jax.random.PRNGKey(9),
                         warmup=40, samples=40,
                         cfg=NUTSConfig(max_depth=5, tree_scan=True,
                                        scan_unroll=2))
    np.testing.assert_array_equal(np.asarray(d2), np.asarray(d1))
    np.testing.assert_array_equal(np.asarray(i2["n_leapfrog"]),
                                  np.asarray(i1["n_leapfrog"]))
