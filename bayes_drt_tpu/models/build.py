"""Assembly of PosteriorConfig/PosteriorData from distribution definitions.

Reproduces the reference's Stan data preparation (reference:
bayes_drt/inversion.py:1684-2122): stacking [Z'; Z''] and [[A'],[A'']],
mode-dependent penalty-matrix scalings and hyperparameters (the baked-in
calibration of the hierarchical model), and outlier hyperparameters.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from .posterior import DistConfig, PosteriorConfig, PosteriorData

# mode-dependent multipliers on (L0, L1, L2) -- the model calibration tables
# (reference: inversion.py:1725-1737 single dist, 1907-1927 series-parallel,
# 1984-2010 series-2parallel, 2067-2087 multidist)
_L_SCALES = {
    ("optimize", "single"): (1.5 * 0.24, 1.5 * 0.16, 1.5 * 0.08),
    ("sample", "single"): (1.0, 1.0, 0.75),
    ("optimize", "series"): (1.5 * 0.24, 1.5 * 0.16, 1.5 * 0.08),
    ("sample", "series"): (1.0, 1.0, 0.75),
    ("optimize", "parallel"): (1.5 * 0.36, 1.5 * 0.16, 1.5 * 0.08),
    ("sample", "parallel"): (1.0, 1.0, 0.75),
    ("optimize", "multi"): (1.5 * 0.24, 1.5 * 0.16, 1.5 * 0.08),
    ("sample", "multi"): (1.0, 1.0, 0.5),
}


def _x_sum_invscale(mode: str, n_series: int, n_parallel: int) -> float:
    """Soft sum-constraint scale (reference: inversion.py:1916-1927 SP,
    1996-2010 S2P, 2076-2087 MultiDist)."""
    n_dist = n_series + n_parallel
    if n_dist <= 1:
        return 0.0
    if mode == "optimize":
        return 0.0
    if n_series == 1 and n_parallel == 1:
        return 1.0
    if n_series == 1 and n_parallel == 2:
        return 0.1
    return 0.0


def z_scale_for(distributions: dict, Z, fit_type: str = "map") -> float:
    """The reference's Z-scale rule (reference: inversion.py:2411-2443).

    Default: std|Z| / sqrt(N/81) (hyperparameters calibrated at N=81). For a
    SINGLE parallel planar-DDT distribution in a map/bayes fit, the scale
    instead targets a calibrated admittance std: std|Y*| = 14 (transmissive)
    or 2.4 (blocking) (reference: inversion.py:2422-2434) — the parallel
    likelihood fits Y = A@x, so the priors are calibrated in Y* units.
    """
    Z = np.asarray(Z)
    n = Z.shape[-1]
    infos = list(distributions.values())
    n_series = sum(1 for i in infos if i["dist_type"] == "series")
    n_par = len(infos) - n_series
    if n_par == 1 and n_series == 0 and fit_type != "ridge":
        info = [i for i in infos if i["dist_type"] == "parallel"][0]
        if info.get("kernel") == "DDT" and info.get("symmetry", "planar") == "planar":
            ystar_std = 14.0 if info.get("bc", "transmissive") == "transmissive" else 2.4
            ymod = np.abs(1.0 / Z)
            return ystar_std * np.sqrt(n / 81) / np.std(ymod, axis=-1)
    return np.std(np.abs(Z), axis=-1) / np.sqrt(n / 81)


def sort_distributions(distributions: dict) -> list:
    """Canonical ordering: series first, then parallel, each sorted by name
    (reference sorts parallel names for Series-2Parallel,
    inversion.py:1962-1968)."""
    series = sorted(n for n, i in distributions.items() if i["dist_type"] == "series")
    parallel = sorted(n for n, i in distributions.items() if i["dist_type"] == "parallel")
    return series + parallel


def build_posterior(distributions: dict, dist_matrices: dict, frequencies,
                    Z_scaled, mode: str = "optimize", part: str = "both",
                    nonneg: bool = False, outliers: bool = False,
                    fitY: bool = False, sigma_min: float = 0.002,
                    inductance_scale: float = 1.0, outlier_lambda=None,
                    dtype=jnp.float64, ncp: bool = False,
                    SA: bool = False, SASY: bool = False):
    """Returns (PosteriorConfig, PosteriorData).

    ``Z_scaled``: complex impedance AFTER Z-scaling (reference applies
    _scale_Z before _prep_stan_data). ``dist_matrices[name]`` must contain
    A_re, A_im (N, K) and L0, L1, L2 (K, K) for each distribution.

    ``SA``/``SASY`` are the reference's experimental row-scaling variants
    (reference: inversion.py:1756-1866), valid only with ``fitY=True``:
    both equilibrate the design matrix rows by S = diag(1/|Y|). ``SA``
    keeps the likelihood in unscaled admittance space (Y_hat = S_inv @
    (SA @ x), Parallel_fitY_SA_modelcode.txt — algebraically identical to
    the plain fitY model); ``SASY`` also scales the data (Y -> S @ Y) and
    fits the plain fitY model in scaled space, which CHANGES the error
    model (homoscedastic noise in scaled space ~ proportional error in raw
    admittance). They are mutually exclusive: the reference's combined
    branch compares scaled data against an unscaled prediction
    (inversion.py:1803 vs 1862) and is broken.
    """
    if mode not in ("optimize", "sample"):
        raise ValueError(f"Invalid mode {mode!r}")
    if part not in ("both", "real", "imag"):
        raise ValueError(f"Invalid part {part!r}")

    if outlier_lambda is None:
        outlier_lambda = 10.0  # (reference: inversion.py:1708-1712)

    freq = np.asarray(frequencies, dtype=float)
    n = len(freq)
    names = sort_distributions(distributions)
    n_series = sum(1 for nm in names if distributions[nm]["dist_type"] == "series")
    n_parallel = len(names) - n_series

    if fitY and (n_parallel == 0 or n_series > 0):
        raise ValueError("fitY=True is only valid for parallel distributions")
    if (SA or SASY) and not fitY:
        # the reference only ships a Stan model for the fitY variant
        # (stan_model_files/Parallel_fitY_SA_modelcode.txt); any other
        # combination fails its model load (inversion.py:1604-1612)
        raise ValueError("SA/SASY row scaling is only valid with fitY=True")
    if SA and SASY:
        raise ValueError(
            "SA and SASY are mutually exclusive: the reference's combined "
            "branch is inconsistent (scaled Y against an unscaled Y_hat, "
            "inversion.py:1803,1862); choose one")

    if len(names) == 1:
        kinds = {names[0]: "single"}
    elif n_series <= 1 and n_parallel <= 2 and len(names) <= 3:
        kinds = {nm: distributions[nm]["dist_type"] for nm in names}
    else:
        kinds = {nm: "multi" for nm in names}

    # row-equilibration scale for the SA/SASY experiments: S = diag(1/|Y|)
    # ("using modulus of Y for scale", reference: inversion.py:1767-1771)
    if SA or SASY:
        Ymod = np.abs(1.0 / np.asarray(Z_scaled))
        row_scale = np.concatenate([Ymod, Ymod])  # (2N,)
    else:
        row_scale = None

    dist_cfgs = []
    A_list, L_list, x_scales = [], [], []
    for nm in names:
        info = distributions[nm]
        mats = dist_matrices[nm]
        k = mats["A_re"].shape[1]
        dist_cfgs.append(DistConfig(name=nm, dist_type=info["dist_type"],
                                    kernel=info.get("kernel", "DRT"), K=k))
        A_np = np.concatenate([mats["A_re"], mats["A_im"]])
        if row_scale is not None:
            A_np = A_np / row_scale[:, None]
        A = jnp.asarray(A_np, dtype=dtype)
        s0, s1, s2 = _L_SCALES[(mode, kinds[nm])]
        L = jnp.asarray(np.stack([s0 * np.asarray(mats["L0"]),
                                  s1 * np.asarray(mats["L1"]),
                                  s2 * np.asarray(mats["L2"])]), dtype=dtype)
        A_list.append(A)
        L_list.append(L)
        if info["dist_type"] == "parallel":
            x_scales.append(jnp.asarray(info.get("x_scale", 1.0), dtype=dtype))
        else:
            x_scales.append(jnp.asarray(1.0, dtype=dtype))

    Z = np.asarray(Z_scaled)
    if fitY:
        Y = 1.0 / Z
        target = np.concatenate([Y.real, Y.imag])
        if SASY:
            # fit in scaled admittance space: Y -> S @ Y
            # (reference: inversion.py:1834-1837,1862)
            target = target / row_scale
    else:
        target = np.concatenate([Z.real, Z.imag])

    if part == "both":
        mask = np.ones(2 * n)
    elif part == "real":
        mask = np.concatenate([np.ones(n), np.zeros(n)])
    else:
        mask = np.concatenate([np.zeros(n), np.ones(n)])

    # mode-dependent hyperparameters (reference: inversion.py:1725-1737)
    if mode == "sample":
        ups_alpha, ups_beta = 1.0, 0.1
        sigma_out_alpha = 5.0
    else:
        ups_alpha, ups_beta = 0.05, 0.1
        sigma_out_alpha = 2.0

    cfg = PosteriorConfig(dists=tuple(dist_cfgs), nonneg=nonneg,
                          outliers=outliers, fitY=fitY, part=part, ncp=ncp,
                          sa=SA)
    data = PosteriorData(
        A=tuple(A_list), L=tuple(L_list),
        target=jnp.asarray(target, dtype=dtype),
        freq=jnp.asarray(freq, dtype=dtype),
        sigma_min=jnp.asarray(sigma_min, dtype=dtype),
        ups_alpha=jnp.asarray(ups_alpha, dtype=dtype),
        ups_beta=jnp.asarray(ups_beta, dtype=dtype),
        induc_scale=jnp.asarray(inductance_scale, dtype=dtype),
        x_sum_invscale=jnp.asarray(_x_sum_invscale(mode, n_series, n_parallel),
                                   dtype=dtype),
        x_scales=tuple(x_scales),
        sigma_out_lambda=jnp.asarray(outlier_lambda, dtype=dtype),
        sigma_out_alpha=jnp.asarray(sigma_out_alpha, dtype=dtype),
        sigma_out_beta=jnp.asarray(1.0, dtype=dtype),
        lik_mask=jnp.asarray(mask, dtype=dtype),
        sa_inv=(jnp.asarray(row_scale, dtype=dtype) if SA else None),
    )
    return cfg, data
