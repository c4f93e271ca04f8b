import numpy as np

from bayes_drt_tpu.infer.diagnostics import (ess, ess_bulk, ess_tail, rhat,
                                             rhat_rank, summary)


def test_rhat_iid_chains():
    rng = np.random.default_rng(0)
    draws = rng.standard_normal((4, 500, 3))
    r = rhat(draws)
    assert np.all(r < 1.02), r


def test_rhat_detects_nonconvergence():
    rng = np.random.default_rng(1)
    draws = rng.standard_normal((4, 500, 1))
    draws[0] += 5.0  # one chain in a different mode
    r = rhat(draws)
    assert r[0] > 1.5, r


def test_ess_iid_near_total():
    rng = np.random.default_rng(2)
    c, n = 4, 1000
    draws = rng.standard_normal((c, n, 2))
    e = ess(draws)
    assert np.all(e > 0.5 * c * n), e
    assert np.all(e < 2.0 * c * n), e


def test_ess_ar1_reduced():
    rng = np.random.default_rng(3)
    c, n, phi = 4, 2000, 0.9
    x = np.zeros((c, n, 1))
    eps = rng.standard_normal((c, n, 1)) * np.sqrt(1 - phi**2)
    for t in range(1, n):
        x[:, t] = phi * x[:, t - 1] + eps[:, t]
    e = ess(x)
    # AR(1) tau = (1+phi)/(1-phi) = 19 -> ESS ~ c*n/19
    expected = c * n / ((1 + phi) / (1 - phi))
    assert 0.4 * expected < e[0] < 2.5 * expected, (e, expected)


def test_summary_keys():
    rng = np.random.default_rng(4)
    s = summary(rng.standard_normal((2, 100, 5)))
    for k in ["mean", "sd", "q2.5", "q97.5", "rhat", "ess"]:
        assert s[k].shape == (5,)


# --- rank-normalized diagnostics (Vehtari et al. 2021) -------------------
# arviz is not in this image, so the golden is an independent, deliberately
# naive transliteration of the published algorithm (explicit loops, scipy
# rankdata), cross-checked against the library's vectorized implementation.

def _golden_rank_z(x):
    from scipy.special import ndtri
    from scipy.stats import rankdata
    c, n, d = x.shape
    z = np.empty_like(x, dtype=float)
    for j in range(d):
        r = rankdata(x[:, :, j].ravel(), method="average")
        z[:, :, j] = ndtri((r - 0.375) / (c * n + 0.25)).reshape(c, n)
    return z


def _golden_split_rhat_scalar(x):
    """x: (c, n) one parameter -> scalar split-Rhat, straight from the
    Gelman/BDA formulas."""
    c, n = x.shape
    half = n // 2
    chains = [x[i, :half] for i in range(c)] + [x[i, half:2 * half]
                                                for i in range(c)]
    m, nn = len(chains), half
    means = np.array([ch.mean() for ch in chains])
    vars_ = np.array([ch.var(ddof=1) for ch in chains])
    w = vars_.mean()
    b = nn * means.var(ddof=1)
    return np.sqrt(((nn - 1) / nn * w + b / nn) / w)


def test_rhat_rank_matches_golden():
    rng = np.random.default_rng(10)
    x = rng.standard_normal((4, 100, 3)) * np.array([1.0, 2.0, 0.5])
    x[1, :, 0] += 0.8  # mild disagreement to move Rhat off 1
    got = rhat_rank(x)
    z = _golden_rank_z(x)
    folded = np.abs(x - np.median(x.reshape(-1, 3), axis=0))
    zf = _golden_rank_z(folded)
    want = np.maximum(
        [_golden_split_rhat_scalar(z[:, :, j]) for j in range(3)],
        [_golden_split_rhat_scalar(zf[:, :, j]) for j in range(3)])
    np.testing.assert_allclose(got, want, rtol=1e-10)


def test_ess_bulk_matches_rank_then_ess():
    rng = np.random.default_rng(11)
    x = rng.standard_normal((4, 200, 2))
    np.testing.assert_allclose(ess_bulk(x), ess(_golden_rank_z(x)),
                               rtol=1e-10)


def test_ess_tail_iid_and_sticky():
    rng = np.random.default_rng(12)
    c, n = 4, 1000
    x = rng.standard_normal((c, n, 1))
    et = ess_tail(x)
    assert 0.5 * c * n < et[0] < 2.0 * c * n, et
    # AR(1)-correlated tails cut tail ESS hard
    phi = 0.95
    y = np.zeros((c, n, 1))
    eps = rng.standard_normal((c, n, 1)) * np.sqrt(1 - phi**2)
    for t in range(1, n):
        y[:, t] = phi * y[:, t - 1] + eps[:, t]
    assert ess_tail(y)[0] < 0.15 * c * n


def test_rhat_rank_catches_variance_mismatch():
    """One chain with inflated variance but the SAME mean: plain split-Rhat
    is blind (between-chain mean variance ~ 0) — the folded half of the
    rank-normalized Rhat catches it. This is the scale-mismatch failure mode
    Vehtari et al. 2021 designed the folded statistic for."""
    rng = np.random.default_rng(13)
    x = rng.standard_normal((4, 400, 1))
    x[0] *= 4.0
    assert rhat(x)[0] < 1.05
    assert rhat_rank(x)[0] > 1.15


def test_rank_diag_jnp_match_numpy():
    import jax.numpy as jnp

    from bayes_drt_tpu.infer.diagnostics import ess_bulk_jnp, rhat_rank_jnp
    rng = np.random.default_rng(14)
    x = rng.standard_normal((4, 120, 3))
    x[2, :, 1] += 1.5
    np.testing.assert_allclose(np.asarray(rhat_rank_jnp(jnp.asarray(x))),
                               rhat_rank(x), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(ess_bulk_jnp(jnp.asarray(x))),
                               ess_bulk(x), rtol=1e-5)


def test_summary_includes_rank_diagnostics():
    rng = np.random.default_rng(15)
    s = summary(rng.standard_normal((2, 100, 5)))
    for k in ["rhat_rank", "ess_bulk", "ess_tail"]:
        assert s[k].shape == (5,)
    assert np.all(s["rhat_rank"] < 1.1)


def test_e_bfmi():
    from bayes_drt_tpu.infer.diagnostics import e_bfmi
    rng = np.random.default_rng(5)
    # iid energies -> BFMI ~ 2 (healthy)
    e = rng.standard_normal((2, 2000))
    assert 1.5 < e_bfmi(e) < 2.5
    # slowly-drifting energies -> low BFMI (pathological)
    slow = np.cumsum(rng.standard_normal((2, 2000)) * 0.05, axis=1)
    assert e_bfmi(slow) < 0.3
