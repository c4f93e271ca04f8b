"""Time-evolving (drift) MAP models.

The reference exposes ``drift_map_fit`` (reference: bayes_drt/
inversion.py:1291-1564) but ships no compiled drift Stan models — the model
math is documented by its data preparation, initialization, extraction, and
prediction code (inversion.py:1359-1437, 2752-2940). This module implements
that documented math as a pure-JAX log posterior:

Forward models (single distribution; t = per-point measurement time):
  x1/x2:  X(t) = x0 + (x1 - x0)(1 - e^{-t/tau_1}) [+ x2 (1 - e^{-t/tau_2})]
          Rinf(t) = Rinf_0 + dRinf (1 - e^{-t/tau_R})
  dx:     X(t) = x0 + dx (1 - e^{-t/tau_dx});   Rinf(t) as above
  dx-lin: X(t) = x0 + dx * t/max(t);            Rinf(t) = Rinf_0 + dRinf t/max(t)
  RQ:     Z(t) = A x0 + F(t) * ZARC(R_rq, tau_rq, phi_rq) + Rinf(t) + jwL,
          F(t) = 1 - e^{-k t}, k in [1e-4, 1]
  RQ-lin: F(t) = t / max(t)
  RQ-from-final / RQ-lin-from-final: final coefficients x1 with
          F(t) = -e^{-k t} or (t - t_f)/(t_f - t_i)

Priors: the same hierarchical complexity prior (q ~ N(0, ups), dups ~ N(0,1),
inverse-gamma hyperpriors) applied to each coefficient vector, and the same
heteroscedastic error model as the static models. Bounded drift parameters
(tau ranges, phi in (0,1), k range) use sigmoid transforms.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from .priors import inv_gamma_lpdf, normal_lpdf, std_normal_lpdf

DRIFT_MODELS = ("x1", "x2", "dx", "dx-lin", "RQ", "RQ-lin", "RQ-from-final",
                "RQ-lin-from-final")


class DriftConfig(NamedTuple):
    drift_model: str
    dist_type: str          # 'series' | 'parallel'
    nonneg: bool
    K: int


class DriftData(NamedTuple):
    A_re: jax.Array         # (N, K)
    A_im: jax.Array         # (N, K)
    L: jax.Array            # (3, K, K) mode-scaled
    Z: jax.Array            # (2N,) stacked scaled target
    freq: jax.Array         # (N,)
    times: jax.Array        # (N,)
    sigma_min: jax.Array
    ups_alpha: jax.Array
    ups_beta: jax.Array
    induc_scale: jax.Array
    tau_bounds: jax.Array   # (2,) [min_tau, max_tau] for the drift time constant
    tau2_bounds: jax.Array  # (2,) second process (x2) bounds
    rq_tau_bounds: jax.Array  # (2,) ZARC tau bounds
    k_bounds: jax.Array     # (2,) rate constant bounds (RQ)
    t_max: jax.Array
    t_min: jax.Array


def _sigmoid_bounded(u, lo, hi):
    return lo + (hi - lo) * jax.nn.sigmoid(u)


def _sigmoid_log_jac(u, lo, hi):
    """log |d/du (lo + (hi-lo) sigmoid(u))|."""
    return (jnp.log(hi - lo) - jax.nn.softplus(-u) - jax.nn.softplus(u))


def _coef_vector_names(cfg: DriftConfig):
    m = cfg.drift_model
    if m in ("x1", "x2"):
        names = ["x0", "x1"] + (["x2"] if m == "x2" else [])
    elif m in ("dx", "dx-lin"):
        names = ["x0", "dx"]
    elif m in ("RQ", "RQ-lin"):
        names = ["x0"]
    else:
        names = ["x1"]
    return names


def init_drift_params(cfg: DriftConfig, data: DriftData, key, init_values=None):
    shapes = {}
    for nm in _coef_vector_names(cfg):
        shapes[nm] = (cfg.K,)
        shapes[f"ups_raw_{nm}"] = (cfg.K,)
        shapes[f"d_strength_{nm}"] = (3,)
    shapes.update({"Rinf0_raw": (), "dRinf_raw": (), "induc_raw": (),
                   "sigma_res_raw": (), "alpha_prop_raw": (),
                   "alpha_re_raw": (), "alpha_im_raw": ()})
    m = cfg.drift_model
    if m in ("x1", "x2"):
        shapes["u_tau_x1"] = ()
        shapes["u_tau_Rinf"] = ()
        if m == "x2":
            shapes["u_tau_x2"] = ()
    elif m == "dx":
        shapes["u_tau_dx"] = ()
        shapes["u_tau_Rinf"] = ()
    elif m.startswith("RQ"):
        shapes.update({"R_rq_raw": (), "u_tau_rq": (), "u_phi_rq": ()})
        if m in ("RQ", "RQ-from-final"):
            shapes["u_k"] = ()
    keys = jax.random.split(key, len(shapes))
    params = {nm: jax.random.uniform(k, shp, minval=-2.0, maxval=2.0)
              for k, (nm, shp) in zip(keys, sorted(shapes.items()))}
    # gentle inits for drift parameters (reference: 1395-1402) — scaled
    # down rather than zeroed so multi-restart fits actually explore
    # different drift basins (with hard zeros every restart shared one
    # deterministic basin and the selected optimum hinged on FP noise in
    # the ridge initialization)
    for nm in params:
        if nm.startswith("u_tau") or nm in ("u_k", "u_phi_rq"):
            params[nm] = 0.3 * params[nm]
    if init_values:
        for nm, v in init_values.items():
            if nm in params:
                params[nm] = jnp.asarray(v)
    return params


def constrain_drift(cfg: DriftConfig, data: DriftData, p: dict) -> dict:
    c = {}
    pos_x = cfg.nonneg or cfg.dist_type == "parallel"
    for nm in _coef_vector_names(cfg):
        if nm in ("x0", "x1") and pos_x:
            c[nm] = jnp.exp(p[nm])
        else:
            c[nm] = p[nm]           # drift increments dx/x2 are free-sign
        c[f"ups_{nm}"] = jnp.exp(p[f"ups_raw_{nm}"]) * 0.15
        c[f"d_strength_{nm}"] = jnp.exp(p[f"d_strength_{nm}"])
    c["Rinf_0"] = jnp.exp(p["Rinf0_raw"]) * 100.0
    c["delta_Rinf"] = p["dRinf_raw"] * 100.0
    c["induc"] = jnp.exp(p["induc_raw"]) * data.induc_scale
    c["sigma_res"] = jnp.exp(p["sigma_res_raw"]) * 0.05
    c["alpha_prop"] = jnp.exp(p["alpha_prop_raw"]) * 0.05
    c["alpha_re"] = jnp.exp(p["alpha_re_raw"]) * 0.05
    c["alpha_im"] = jnp.exp(p["alpha_im_raw"]) * 0.05
    m = cfg.drift_model
    if m in ("x1", "x2", "dx"):
        c["tau_1"] = _sigmoid_bounded(p.get("u_tau_x1", p.get("u_tau_dx")),
                                      data.tau_bounds[0], data.tau_bounds[1])
        c["tau_Rinf"] = _sigmoid_bounded(p["u_tau_Rinf"], data.tau_bounds[0],
                                         data.tau_bounds[1])
        if m == "x2":
            c["tau_2"] = _sigmoid_bounded(p["u_tau_x2"], data.tau2_bounds[0],
                                          data.tau2_bounds[1])
    elif m.startswith("RQ"):
        c["R_rq"] = jnp.exp(p["R_rq_raw"])
        c["tau_rq"] = jnp.exp(_sigmoid_bounded(
            p["u_tau_rq"], jnp.log(data.rq_tau_bounds[0]),
            jnp.log(data.rq_tau_bounds[1])))
        c["phi_rq"] = jax.nn.sigmoid(p["u_phi_rq"])
        if m in ("RQ", "RQ-from-final"):
            # k spans decades; bound it in log space so the optimizer has
            # useful gradients across the whole range
            c["k_d"] = jnp.exp(_sigmoid_bounded(p["u_k"],
                                                jnp.log(data.k_bounds[0]),
                                                jnp.log(data.k_bounds[1])))
    return c


def _f_t(cfg: DriftConfig, data: DriftData, c: dict):
    m = cfg.drift_model
    t = data.times
    if m == "RQ":
        return 1.0 - jnp.exp(-c["k_d"] * t)
    if m == "RQ-lin":
        return t / data.t_max
    if m == "RQ-from-final":
        return -jnp.exp(-c["k_d"] * t)
    if m == "RQ-lin-from-final":
        return (t - data.t_max) / (data.t_max - data.t_min)
    raise ValueError(m)


def predict_drift_target(cfg: DriftConfig, data: DriftData, c: dict):
    """Stacked [Z'; Z''] prediction with per-point time dependence."""
    m = cfg.drift_model
    t = data.times
    omega = 2.0 * jnp.pi * data.freq

    if m in ("x1", "x2", "dx", "dx-lin"):
        decay1 = 1.0 - jnp.exp(-t / c["tau_1"]) if m != "dx-lin" else t / data.t_max
        if m in ("x1", "x2"):
            X = c["x0"][None, :] + (c["x1"] - c["x0"])[None, :] * decay1[:, None]
            if m == "x2":
                decay2 = 1.0 - jnp.exp(-t / c["tau_2"])
                X = X + c["x2"][None, :] * decay2[:, None]
        else:
            X = c["x0"][None, :] + c["dx"][None, :] * decay1[:, None]
        zr = jnp.sum(data.A_re * X, axis=1)
        zi = jnp.sum(data.A_im * X, axis=1)
        if cfg.dist_type == "parallel":
            denom = zr**2 + zi**2
            zr, zi = zr / denom, -zi / denom
        if m == "dx-lin":
            rinf_t = c["Rinf_0"] + c["delta_Rinf"] * (t / data.t_max)
        else:
            rinf_t = (c["Rinf_0"]
                      + c["delta_Rinf"] * (1.0 - jnp.exp(-t / c["tau_Rinf"])))
    else:
        x_static = c["x1"] if m.endswith("from-final") else c["x0"]
        zr = data.A_re @ x_static
        zi = data.A_im @ x_static
        if cfg.dist_type == "parallel":
            denom = zr**2 + zi**2
            zr, zi = zr / denom, -zi / denom
        f_t = _f_t(cfg, data, c)
        z_rq = c["R_rq"] / (1.0 + (1j * omega * c["tau_rq"]) ** c["phi_rq"])
        zr = zr + f_t * z_rq.real
        zi = zi + f_t * z_rq.imag
        if m.endswith("from-final"):
            rinf_t = c["Rinf_0"] + c["delta_Rinf"] * f_t  # Rinf_0 plays Rinf_1
        else:
            rinf_t = c["Rinf_0"] + c["delta_Rinf"] * f_t
    zr = zr + rinf_t
    zi = zi + c["induc"] * omega
    return jnp.concatenate([zr, zi])


def drift_log_density(cfg: DriftConfig, data: DriftData, p: dict,
                      jacobian: bool = False):
    """MAP objective for drift fits (Stan optimizing semantics by default)."""
    c = constrain_drift(cfg, data, p)
    lp = jnp.zeros(())
    pos_x = cfg.nonneg or cfg.dist_type == "parallel"

    if jacobian:
        for nm in _coef_vector_names(cfg):
            if nm in ("x0", "x1") and pos_x:
                lp = lp + jnp.sum(p[nm])
            lp = lp + jnp.sum(p[f"ups_raw_{nm}"]) + jnp.sum(p[f"d_strength_{nm}"])
        for nm in ("Rinf0_raw", "induc_raw", "sigma_res_raw", "alpha_prop_raw",
                   "alpha_re_raw", "alpha_im_raw"):
            lp = lp + p[nm]
        m = cfg.drift_model
        if m in ("x1", "x2", "dx"):
            u_t1 = p.get("u_tau_x1", p.get("u_tau_dx"))
            lp = lp + _sigmoid_log_jac(u_t1, data.tau_bounds[0],
                                       data.tau_bounds[1])
            lp = lp + _sigmoid_log_jac(p["u_tau_Rinf"], data.tau_bounds[0],
                                       data.tau_bounds[1])
            if m == "x2":
                lp = lp + _sigmoid_log_jac(p["u_tau_x2"], data.tau2_bounds[0],
                                           data.tau2_bounds[1])
        elif m.startswith("RQ"):
            lp = lp + p["R_rq_raw"]                      # exp transform
            # tau_rq = exp(bounded(u)) in log space -> chain both Jacobians
            lp = lp + jnp.log(c["tau_rq"]) + _sigmoid_log_jac(
                p["u_tau_rq"], jnp.log(data.rq_tau_bounds[0]),
                jnp.log(data.rq_tau_bounds[1]))
            lp = lp + _sigmoid_log_jac(p["u_phi_rq"], 0.0, 1.0)
            if m in ("RQ", "RQ-from-final"):
                lp = lp + jnp.log(c["k_d"]) + _sigmoid_log_jac(
                    p["u_k"], jnp.log(data.k_bounds[0]),
                    jnp.log(data.k_bounds[1]))

    lp = lp + std_normal_lpdf(jnp.exp(p["Rinf0_raw"]))
    lp = lp + std_normal_lpdf(p["dRinf_raw"])
    lp = lp + std_normal_lpdf(jnp.exp(p["induc_raw"]))
    lp = lp + std_normal_lpdf(jnp.exp(p["sigma_res_raw"]))
    lp = lp + std_normal_lpdf(jnp.exp(p["alpha_prop_raw"]))
    lp = lp + std_normal_lpdf(jnp.exp(p["alpha_re_raw"]))
    lp = lp + std_normal_lpdf(jnp.exp(p["alpha_im_raw"]))
    if cfg.drift_model.startswith("RQ"):
        lp = lp + std_normal_lpdf(jnp.exp(p["R_rq_raw"]))

    for nm in _coef_vector_names(cfg):
        x_raw = c[nm]
        ds = c[f"d_strength_{nm}"]
        lp = lp + inv_gamma_lpdf(ds, 5.0, 5.0)
        ups_raw = jnp.exp(p[f"ups_raw_{nm}"])
        lp = lp + inv_gamma_lpdf(ups_raw, data.ups_alpha, data.ups_beta)
        L = data.L
        q = jnp.sqrt(ds[0] * (L[0] @ x_raw)**2 + ds[1] * (L[1] @ x_raw)**2
                     + ds[2] * (L[2] @ x_raw)**2)
        ups = c[f"ups_{nm}"]
        lp = lp + normal_lpdf(q, 0.0, ups)
        dups = 0.5 * (ups[1:-1] - 0.5 * (ups[:-2] + ups[2:])) / ups[1:-1]
        lp = lp + std_normal_lpdf(dups)

    pred = predict_drift_target(cfg, data, c)
    n = data.freq.shape[0]
    pred_re = jnp.tile(pred[:n], 2)
    pred_im = jnp.tile(pred[n:], 2)
    st = jnp.sqrt(data.sigma_min**2 + c["sigma_res"]**2
                  + (c["alpha_prop"] * pred)**2 + (c["alpha_re"] * pred_re)**2
                  + (c["alpha_im"] * pred_im)**2)
    lp = lp + normal_lpdf(data.Z - pred, 0.0, st)
    return lp
