"""Havriliak-Negami peak fitting of recovered distributions.

Re-implements the reference's peak-fit engine (reference:
bayes_drt/peak_fit.py) with the bounded nonlinear least squares running as a
jitted JAX Levenberg-Marquardt (infer/lsq.py) instead of scipy — vmappable
for batched peak decomposition. Peak *detection* (find_peaks control logic)
stays on host via scipy.signal.
"""

from __future__ import annotations

import numpy as np
from scipy.signal import find_peaks

import jax.numpy as jnp

from .infer.lsq import bounded_lm


# --- HN analytics (reference: peak_fit.py:7-33) ----------------------------

def HN_distribution(tau, t0, alpha, beta):
    """Analytical DRT of a Havriliak-Negami relaxation. alpha=1: ZARC;
    beta=1: Cole-Davidson; alpha=0.5, beta=1: Gerischer."""
    r = (tau / t0) ** beta
    theta = jnp.arctan2(jnp.sin(jnp.pi * beta), r + jnp.cos(jnp.pi * beta))
    return ((1.0 / jnp.pi) * (tau / t0) ** (beta * alpha) * jnp.sin(alpha * theta)
            / (1.0 + 2.0 * jnp.cos(jnp.pi * beta) * r + r**2) ** (alpha / 2.0))


def HN_impedance(freq, t0, alpha, beta):
    omega = 2 * jnp.pi * freq
    return 1.0 / (1.0 + (1j * omega * t0) ** beta) ** alpha


def evaluate_fit_distribution(x, tau):
    """Sum of HN peaks; x packs (R, ln t0, alpha, beta) per peak."""
    x = jnp.asarray(x, float)
    if x.shape[0] % 4 != 0:
        raise ValueError("Number of parameters must be a multiple of 4")
    n_peaks = x.shape[0] // 4
    tau = jnp.asarray(tau, float)
    if n_peaks == 0:
        return np.zeros(len(tau))
    p = x.reshape(n_peaks, 4)
    gammas = jnp.stack([p[i, 0] * HN_distribution(tau, jnp.exp(p[i, 1]),
                                                  p[i, 2], p[i, 3])
                        for i in range(n_peaks)])
    return gammas.sum(axis=0)


def evaluate_fit_impedance(x, freq, R_inf=0.0, inductance=0.0):
    x = jnp.asarray(x, float)
    if x.shape[0] % 4 != 0:
        raise ValueError("Number of parameters must be a multiple of 4")
    n_peaks = x.shape[0] // 4
    freq = jnp.asarray(freq, float)
    z = jnp.zeros(len(freq), dtype=complex)
    p = x.reshape(n_peaks, 4) if n_peaks else x.reshape(0, 4)
    for i in range(n_peaks):
        z = z + p[i, 0] * HN_impedance(freq, jnp.exp(p[i, 1]), p[i, 2], p[i, 3])
    return z + R_inf + 1j * inductance * 2 * jnp.pi * freq


# --- residuals & solve (reference: peak_fit.py:68-73) ----------------------

def peak_fit_residuals(x, tau, gamma, Rp, weights, l1_penalty, l2_penalty):
    """Stacked HN-fit residual vector: weighted distribution misfit, L1/L2
    penalties on peak magnitudes, and the Rp-match residual
    (reference: peak_fit.py:68-73). Traceable — ``_solve_peaks`` drives the
    jitted bounded-LM solver through this same function."""
    x = jnp.asarray(x, float)
    resid = (evaluate_fit_distribution(x, jnp.asarray(tau, float))
             - jnp.asarray(gamma, float)) * jnp.asarray(weights, float)
    R_vals = x[::4]
    l1 = jnp.sqrt(jnp.abs(R_vals / Rp)) * l1_penalty
    l2 = (R_vals / Rp) * l2_penalty
    rp_resid = 2.0 * (jnp.sum(R_vals) - Rp) / Rp
    return jnp.concatenate([resid, l1, l2, jnp.array([rp_resid])])


def _solve_peaks(tau, gamma, Rp, x0, lb, ub, weights, l1_penalty, l2_penalty):
    tau_j = jnp.asarray(tau, float)
    gamma_j = jnp.asarray(gamma, float)
    w_j = jnp.asarray(weights, float)

    def residuals(x):
        return peak_fit_residuals(x, tau_j, gamma_j, Rp, w_j,
                                  l1_penalty, l2_penalty)

    res = bounded_lm(residuals, jnp.asarray(x0), jnp.asarray(lb),
                     jnp.asarray(ub), max_iter=300)
    return np.asarray(res.x)


def filter_peaks(x, rthresh, Rp):
    """Drop peaks with |R|/Rp below threshold (reference: peak_fit.py:386-398)."""
    x = np.asarray(x)
    keep = np.abs(x[::4] / Rp) >= rthresh
    return x.reshape(-1, 4)[keep].ravel()


def _default_weights(gamma, min_weight_deno=None):
    if min_weight_deno is None:
        min_weight_deno = max(np.percentile(gamma, 80), np.max(gamma) / 50)
    return 1.0 / (gamma + min_weight_deno)


def fit_pos_peaks(tau, gamma, Rp, weights=None, check_shoulders=False,
                  prom_rthresh=0.001, R_rthresh=0.005, check_chi_sq=False,
                  chi_sq_thresh=0.4, chi_sq_delta=0.2, min_weight_deno=None,
                  l1_penalty=0, l2_penalty=0.01):
    """Detect and fit positive HN peaks (reference: peak_fit.py:131-317)."""
    tau = np.asarray(tau, float)
    gamma = np.asarray(gamma, float)
    if len(tau) != len(gamma):
        raise ValueError("tau and gamma must have same length")

    peaks, properties = find_peaks(gamma, width=1, prominence=prom_rthresh * Rp)
    if len(peaks) == 0:
        return np.array([])

    def init_params(peak_list, width_list, base=None):
        base = np.array([]) if base is None else np.asarray(base)
        x0 = np.zeros(len(base) + 4 * len(peak_list))
        x0[:len(base)] = base
        n0 = len(base) // 4
        for i, (peak, width) in enumerate(zip(peak_list, width_list)):
            start = max(int(peak - width), 0)
            end = min(int(peak + width), len(tau))
            R = np.trapezoid(gamma[start:end], np.log(tau[start:end]))
            if R <= 0:
                R = gamma[peak]
            x0[4 * (n0 + i):4 * (n0 + i) + 4] = [R, np.log(tau[peak]), 0.99, 0.8]
        return x0

    def bounds_for(x0, lntau_window=0.25):
        n = len(x0) // 4
        lb = np.zeros_like(x0)
        ub = np.zeros_like(x0)
        for i in range(n):
            log_t0 = x0[4 * i + 1]
            lb[4 * i:4 * i + 4] = [0, log_t0 - lntau_window, 0, 0]
            ub[4 * i:4 * i + 4] = [np.inf, log_t0 + lntau_window, 1, 1]
        return lb, ub

    if weights is None:
        weights = _default_weights(gamma, min_weight_deno)
    elif len(weights) != len(gamma):
        raise ValueError("Length of weights must match length of gamma")

    x0 = init_params(peaks, properties["widths"])
    lb, ub = bounds_for(x0)
    x = _solve_peaks(tau, gamma, Rp, x0, lb, ub, weights, l1_penalty, l2_penalty)
    x_filter = filter_peaks(x, R_rthresh, Rp)

    if check_shoulders and len(x_filter) > 0:
        # shoulders show up as peaks of the first derivative
        # (reference: peak_fit.py:198-266)
        gamma_fit = np.asarray(evaluate_fit_distribution(x, tau))
        dg = np.diff(gamma)
        pos_peaks, _ = find_peaks(dg)
        neg_peaks, _ = find_peaks(-dg)
        if len(pos_peaks) and len(neg_peaks):
            if neg_peaks[0] < pos_peaks[0]:
                pos_peaks = np.insert(pos_peaks, 0, 0)
            if pos_peaks[-1] > neg_peaks[-1]:
                neg_peaks = np.append(neg_peaks, len(tau) - 1)
            new_peaks, new_widths = [], []
            if len(pos_peaks) == len(neg_peaks):
                for pos, neg in zip(pos_peaks, neg_peaks):
                    in_interval = np.where((pos <= peaks) & (peaks <= neg))[0]
                    if len(in_interval) == 0 and neg > pos:
                        new_idx = pos + int(np.argmax((gamma - gamma_fit)[pos:neg]))
                        new_peaks.append(new_idx)
                        new_widths.append(max(neg - pos, 1))
            if new_peaks:
                x0 = init_params(new_peaks, new_widths, base=x_filter)
                lb, ub = bounds_for(x0)
                x = _solve_peaks(tau, gamma, Rp, x0, lb, ub, weights,
                                 l1_penalty, l2_penalty)
                x_filter = filter_peaks(x, R_rthresh, Rp)

    if check_chi_sq and len(x_filter) > 0:
        # chi_sq-triggered extra peak (reference: peak_fit.py:268-316)
        def chi_sq_of(params):
            resid = np.asarray(evaluate_fit_distribution(params, tau)) - gamma
            return float(np.sum((resid * weights) ** 2))

        chi_sq = chi_sq_of(x_filter)
        if chi_sq > chi_sq_thresh:
            gamma_fit = np.asarray(evaluate_fit_distribution(x_filter, tau))
            peak = int(np.argmax(gamma - gamma_fit))
            R = np.trapezoid(gamma - gamma_fit, np.log(tau))
            if R <= 0:
                R = gamma[peak]
            x0 = np.concatenate([x_filter, [R, np.log(tau[peak]), 0.99, 0.8]])
            lb, ub = bounds_for(x0)
            # new peak's tau may move anywhere within the grid
            lb[-3] = np.log(tau.min())
            ub[-3] = np.log(tau.max())
            x_new = _solve_peaks(tau, gamma, Rp, x0, lb, ub, weights,
                                 l1_penalty, l2_penalty)
            x_new = filter_peaks(x_new, R_rthresh, Rp)
            if chi_sq_of(x_new) <= chi_sq - chi_sq_delta:
                x_filter = x_new

    return x_filter


def fit_peaks(tau, gamma, Rp, weights=None, nonneg=True, check_shoulders=False,
              prom_rthresh=0.001, R_rthresh=0.005, check_chi_sq=False,
              chi_sq_thresh=0.4, chi_sq_delta=0.2, l1_penalty=0,
              l2_penalty=0.01):
    """Fit HN peaks; negative distributions fit pos/neg lobes separately then
    jointly (reference: peak_fit.py:76-128)."""
    tau = np.asarray(tau, float)
    gamma = np.asarray(gamma, float)
    if nonneg:
        return fit_pos_peaks(tau, gamma, Rp, weights, check_shoulders,
                             prom_rthresh, R_rthresh, check_chi_sq,
                             chi_sq_thresh, chi_sq_delta, None, l1_penalty,
                             l2_penalty)

    gamma_pos = np.maximum(gamma, 0.0)
    gamma_neg = np.minimum(gamma, 0.0)
    deno = np.percentile(np.abs(gamma), 80)
    x_pos = fit_pos_peaks(tau, gamma_pos, Rp, weights, check_shoulders,
                          prom_rthresh, R_rthresh, check_chi_sq, chi_sq_thresh,
                          chi_sq_delta, deno, l1_penalty, l2_penalty)
    x_neg = fit_pos_peaks(tau, -gamma_neg, Rp, weights, check_shoulders,
                          prom_rthresh, R_rthresh, check_chi_sq, chi_sq_thresh,
                          chi_sq_delta, deno, l1_penalty, l2_penalty)
    if len(x_neg):
        x_neg = np.asarray(x_neg)
        x_neg[0::4] *= -1
    x0 = np.concatenate([x_pos, x_neg])
    if len(x0) == 0:
        return x0

    w = 1.0 / (gamma + deno)
    n = len(x0) // 4
    lb = np.zeros_like(x0)
    ub = np.zeros_like(x0)
    for i in range(n):
        log_t0 = x0[4 * i + 1]
        lb[4 * i:4 * i + 4] = [-np.inf, log_t0 - 0.1, 0, 0]
        ub[4 * i:4 * i + 4] = [np.inf, log_t0 + 0.1, 1, 1]
    x = _solve_peaks(tau, gamma, Rp, x0, lb, ub, w, l1_penalty, l2_penalty)
    return filter_peaks(x, R_rthresh, Rp)


def constrained_peak_fit(tau, gamma, tau0_guess, Rp, nonneg,
                         lntau_uncertainty=3, sigma_lntau=5, weights=None,
                         l2_penalty=0.01):
    """Peaks at user-specified time constants with ln-tau priors
    (reference: peak_fit.py:401-458)."""
    tau = np.asarray(tau, float)
    gamma = np.asarray(gamma, float)
    tau0_guess = np.asarray(tau0_guess, float)
    num_peaks = len(tau0_guess)
    if len(tau) != len(gamma):
        raise ValueError("tau and gamma must have same length")
    if weights is None:
        weights = 1.0 / (gamma + np.percentile(np.abs(gamma), 80))
    elif len(weights) != len(gamma):
        raise ValueError("Length of weights must match length of gamma")

    x0 = np.zeros(num_peaks * 4)
    for i, t0 in enumerate(tau0_guess):
        start = int(np.argmin(np.abs(tau - t0 * np.exp(-2.0))))
        end = int(np.argmin(np.abs(tau - t0 * np.exp(2.0))))
        R = np.trapezoid(gamma[start:end + 1], np.log(tau[start:end + 1]))
        x0[4 * i:4 * i + 4] = [R, np.log(t0), 0.99, 0.8]

    lb = np.zeros_like(x0)
    ub = np.zeros_like(x0)
    for i in range(num_peaks):
        R0 = x0[4 * i]
        log_t0 = x0[4 * i + 1]
        if nonneg or R0 > 0:
            r_lb, r_ub = 0.0, np.inf
        else:
            r_lb, r_ub = -np.inf, 0.0
        lb[4 * i:4 * i + 4] = [r_lb, log_t0 - lntau_uncertainty, 0, 0]
        ub[4 * i:4 * i + 4] = [r_ub, log_t0 + lntau_uncertainty, 1, 1]

    tau_j = jnp.asarray(tau)
    gamma_j = jnp.asarray(gamma)
    w_j = jnp.asarray(weights, float)
    log_tau0 = jnp.asarray(np.log(tau0_guess))

    def residuals(x):
        fit = evaluate_fit_distribution(x, tau_j)
        tau_resid = (x[1::4] - log_tau0) / sigma_lntau
        l2 = (x[::4] / Rp) * l2_penalty
        rp_resid = 2.0 * (jnp.sum(x[::4]) - Rp) / Rp
        return jnp.concatenate([(fit - gamma_j) * w_j, tau_resid, l2,
                                jnp.array([rp_resid])])

    res = bounded_lm(residuals, jnp.asarray(x0), jnp.asarray(lb),
                     jnp.asarray(ub), max_iter=300)
    return {"x": np.asarray(res.x), "cost": float(res.cost)}


def fit_data(x0, freq, Z, R_inf=0.0, inductance=0.0, weights=None,
             lambda_x=10.0):
    """Re-optimize HN params against impedance data with Gaussian penalties
    tying them to the distribution fit (reference: peak_fit.py:320-383)."""
    freq = np.asarray(freq, float)
    Z = np.asarray(Z)
    x0 = np.asarray(x0, float)

    if weights is None or (isinstance(weights, str) and weights == "unity"):
        weights = np.ones(len(freq)) * (1 + 1j)
    elif isinstance(weights, str):
        if weights == "modulus":
            weights = (1 + 1j) / np.abs(Z)
        elif weights == "Orazem":
            weights = (1 + 1j) / (np.abs(Z.real) + np.abs(Z.imag))
        elif weights == "proportional":
            weights = 1 / np.abs(Z.real) + 1j / np.abs(Z.imag)
        elif weights == "prop_adj":
            zmod2 = np.real(Z * Z.conjugate())
            q25 = np.percentile(zmod2, 25)
            weights = 1 / (np.abs(Z.real) + q25) + 1j / (np.abs(Z.imag) + q25)
        else:
            raise ValueError(f"Invalid weights argument {weights!r}")
    elif isinstance(weights, (float, int)):
        weights = np.ones(len(freq)) * (1 + 1j) * weights

    flat_w = jnp.asarray(np.concatenate([np.real(weights), np.imag(weights)]))
    freq_j = jnp.asarray(freq)
    z_flat = jnp.asarray(np.concatenate([Z.real, Z.imag]))
    x0_j = jnp.asarray(x0)
    n_params = len(x0)

    def residuals(x):
        z_fit = evaluate_fit_impedance(x, freq_j, R_inf, inductance)
        z_resid = jnp.concatenate([z_fit.real, z_fit.imag]) - z_flat
        z_resid = z_resid * flat_w / (2 * len(freq))
        dx = x - x0_j
        r_resid = dx[::4] / (0.05 * x0_j[::4])
        logt_resid = dx[1::4] / 0.2
        alpha_resid = dx[2::4] / 0.15
        beta_resid = dx[3::4] / 0.15
        x_resid = jnp.concatenate([r_resid, logt_resid, alpha_resid,
                                   beta_resid]) / n_params
        return jnp.concatenate([z_resid, lambda_x * x_resid])

    lb = np.zeros_like(x0)
    ub = np.zeros_like(x0)
    for i in range(len(x0) // 4):
        log_t0 = x0[4 * i + 1]
        lb[4 * i:4 * i + 4] = [0, log_t0 - 1, 0, 0]
        ub[4 * i:4 * i + 4] = [np.inf, log_t0 + 1, 1, 1]
    res = bounded_lm(residuals, x0_j, jnp.asarray(lb), jnp.asarray(ub),
                     max_iter=300)
    return {"x": np.asarray(res.x), "cost": float(res.cost)}
