"""MCMC diagnostics: split-Rhat and bulk ESS.

The reference has no diagnostics beyond Stan's console output; these power
the ESS/sec benchmark metric (BASELINE.json) and convergence checks in the
Inverter API. Host-side numpy (FFT autocorrelation with Geyer's initial
positive sequence) — diagnostics run once per fit, not in the hot path.
"""

from __future__ import annotations

import numpy as np


def split_chains(draws):
    """(chains, draws, ...) -> (2*chains, draws//2, ...)"""
    draws = np.asarray(draws)
    c, n = draws.shape[:2]
    half = n // 2
    return np.concatenate([draws[:, :half], draws[:, half:2 * half]], axis=0)


def rhat(draws) -> np.ndarray:
    """Split-Rhat (Gelman et al.). draws: (chains, n, dim) -> (dim,)."""
    x = split_chains(draws)
    c, n = x.shape[:2]
    chain_mean = x.mean(axis=1)
    chain_var = x.var(axis=1, ddof=1)
    w = chain_var.mean(axis=0)
    b = n * chain_mean.var(axis=0, ddof=1)
    var_plus = (n - 1) / n * w + b / n
    return np.sqrt(var_plus / np.where(w > 0, w, 1.0))


def _autocov_fft(x):
    """Per-chain autocovariance via FFT. x: (c, n, d)."""
    c, n, d = x.shape
    xc = x - x.mean(axis=1, keepdims=True)
    m = int(2 ** np.ceil(np.log2(2 * n)))
    f = np.fft.rfft(xc, n=m, axis=1)
    acov = np.fft.irfft(f * np.conj(f), n=m, axis=1)[:, :n].real
    return acov / n


def ess(draws) -> np.ndarray:
    """Bulk effective sample size. draws: (chains, n, dim) -> (dim,)."""
    x = split_chains(np.asarray(draws, dtype=float))
    c, n, d = x.shape
    if n < 4:
        return np.full(d, float(c * n))
    acov = _autocov_fft(x)                      # (c, n, d)
    chain_var = acov[:, 0]                      # biased var (ddof=0)
    mean_var = chain_var.mean(axis=0) * n / (n - 1.0)
    var_plus = mean_var * (n - 1.0) / n + x.mean(axis=1).var(axis=0, ddof=1)
    var_plus = np.where(var_plus > 0, var_plus, 1.0)

    rho = 1.0 - (mean_var - acov.mean(axis=0)) / var_plus   # (n, d)
    rho[0] = 1.0

    out = np.empty(d)
    for j in range(d):
        # Geyer initial monotone positive sequence: pair (rho_0 + rho_1),
        # (rho_2 + rho_3), ... — positivity/monotonicity hold only for this
        # even-odd pairing
        t = 0
        pair_sums = []
        while t + 1 < n:
            s = rho[t, j] + rho[t + 1, j]
            if s < 0:
                break
            pair_sums.append(s)
            t += 2
        # enforce monotone decrease
        for i in range(1, len(pair_sums)):
            pair_sums[i] = min(pair_sums[i], pair_sums[i - 1])
        tau = -1.0 + 2.0 * sum(pair_sums)
        tau = max(tau, 1.0 / np.log10(c * n + 10.0))
        out[j] = c * n / tau
    return out


def ess_jnp(draws):
    """Bulk ESS as a pure-jnp program: (chains, n, d) -> (d,).

    Same estimator as :func:`ess` (split chains, FFT autocovariance, Geyer
    initial monotone positive sequence) but jit/vmap-compatible so it can
    run ON DEVICE inside a batched sampling program — the data-dependent
    truncation becomes a masked prefix (cumprod of the pair-positivity
    flags) and the monotone enforcement a cumulative minimum. Matches the
    numpy version to float tolerance; powers the in-program min-ESS
    diagnostics of fit_spectra_batch (BASELINE.json's headline metric is
    HMC ESS/sec, reference: Stan's sampling output, inversion.py:1218-1221).
    """
    import jax
    import jax.numpy as jnp

    x = draws
    c0, n0 = x.shape[0], x.shape[1]
    half = n0 // 2
    x = jnp.concatenate([x[:, :half], x[:, half:2 * half]], axis=0)
    c, n = 2 * c0, half
    if n < 4:
        return jnp.full(x.shape[-1], float(c * n), x.dtype)

    xc = x - x.mean(axis=1, keepdims=True)
    m = int(2 ** np.ceil(np.log2(2 * n)))
    f = jnp.fft.rfft(xc, n=m, axis=1)
    acov = jnp.fft.irfft(f * jnp.conj(f), n=m, axis=1)[:, :n].real / n

    chain_var = acov[:, 0]                                   # (c, d)
    mean_var = chain_var.mean(axis=0) * n / (n - 1.0)
    var_plus = mean_var * (n - 1.0) / n + x.mean(axis=1).var(axis=0, ddof=1)
    var_plus = jnp.where(var_plus > 0, var_plus, 1.0)

    rho = 1.0 - (mean_var - acov.mean(axis=0)) / var_plus    # (n, d)
    rho = rho.at[0].set(1.0)

    n_pairs = n // 2
    pair = rho[0:2 * n_pairs:2] + rho[1:2 * n_pairs:2]       # (n_pairs, d)
    # initial positive sequence: keep the maximal prefix of nonneg pair sums
    kept = jnp.cumprod((pair >= 0).astype(rho.dtype), axis=0)
    # monotone decrease over the kept prefix (masked entries sit at +inf so
    # they never lower the running minimum, and are zeroed out of the sum)
    mono = jax.lax.cummin(jnp.where(kept > 0, pair, jnp.inf), axis=0)
    tau = -1.0 + 2.0 * jnp.sum(jnp.where(kept > 0, mono, 0.0), axis=0)
    tau = jnp.maximum(tau, 1.0 / np.log10(c * n + 10.0))
    return c * n / tau


def e_bfmi(energy) -> float:
    """Energy Bayesian fraction of missing information (Betancourt 2016):
    Var(dE)/Var(E) per chain, averaged. Values < ~0.3 flag poor energy-set
    exploration. energy: (chains, n) or (n,)."""
    e = np.atleast_2d(np.asarray(energy, dtype=float))
    num = np.mean(np.diff(e, axis=1) ** 2, axis=1)
    den = np.var(e, axis=1)
    return float(np.mean(num / np.where(den > 0, den, 1.0)))


def summary(draws) -> dict:
    """Per-parameter posterior summary. draws: (chains, n, dim)."""
    x = np.asarray(draws)
    flat = x.reshape(-1, x.shape[-1])
    return {
        "mean": flat.mean(axis=0),
        "sd": flat.std(axis=0, ddof=1),
        "q2.5": np.percentile(flat, 2.5, axis=0),
        "q97.5": np.percentile(flat, 97.5, axis=0),
        "rhat": rhat(x),
        "ess": ess(x),
    }
