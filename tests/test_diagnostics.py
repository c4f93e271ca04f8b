import numpy as np

from bayes_drt_tpu.infer.diagnostics import ess, rhat, summary


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


def test_e_bfmi():
    from bayes_drt_tpu.infer.diagnostics import e_bfmi
    rng = np.random.default_rng(5)
    # iid energies -> BFMI ~ 2 (healthy)
    e = rng.standard_normal((2, 2000))
    assert 1.5 < e_bfmi(e) < 2.5
    # slowly-drifting energies -> low BFMI (pathological)
    slow = np.cumsum(rng.standard_normal((2, 2000)) * 0.05, axis=1)
    assert e_bfmi(slow) < 0.3
