import numpy as np
import pandas as pd
import pytest

import jax.numpy as jnp

from bayes_drt_tpu.ops.matrices import (construct_A, construct_L, construct_M,
                                        default_epsilon, get_tau_basis)
from bayes_drt_tpu.infer.ridge import (HyperLambdaConfig, RidgeData,
                                       run_hyper_lambda, run_ordinary_ridge,
                                       run_hyper_weights)

from reference_ridge import run_hyper_lambda_golden, solve_qp_golden


def load_spectrum(name="Z_ZARC_Macdonald_0.25.csv"):
    df = pd.read_csv(f"/root/reference/data/simulated/{name}")
    freq = df["Freq"].values
    Z = df["Zreal"].values + 1j * df["Zimag"].values
    # sort descending frequency like the reference (inversion.py:2138-2141)
    idx = np.argsort(freq)[::-1]
    return freq[idx], Z[idx]


def build_series_problem(freq, Z, penalty="discrete", weights=None):
    """Replicates the series augmentation of the reference
    (inversion.py:401-441): columns 0/1 are R_inf and scaled inductance."""
    tau = get_tau_basis(freq)
    eps = default_epsilon(tau)
    f_coll = 1.0 / (2 * np.pi * tau)
    k = len(tau) + 2

    A_re = np.zeros((len(freq), k))
    A_re[:, 0] = 1.0
    A_re[:, 2:] = np.asarray(construct_A(freq, "real", tau=tau, epsilon=eps))
    A_im = np.zeros((len(freq), k))
    A_im[:, 1] = 2 * np.pi * freq * 1e-4
    A_im[:, 2:] = np.asarray(construct_A(freq, "imag", tau=tau, epsilon=eps))

    # scale Z like the reference (inversion.py:2437-2441)
    z_scale = np.std(np.abs(Z)) / np.sqrt(len(Z) / 81)
    Zs = Z / z_scale

    if weights == "modulus":
        w = 1.0 / np.abs(Zs)
    else:
        w = np.ones(len(freq))

    WA_re = w[:, None] * A_re
    WA_im = w[:, None] * A_im
    WT_re = w * Zs.real
    WT_im = w * Zs.imag

    if penalty == "discrete":
        L_ops = []
        L2_base = []
        for order in (0, 1, 2):
            L = np.asarray(construct_L(f_coll, tau=tau, epsilon=eps, order=order))
            Lp = np.hstack([np.zeros((L.shape[0], 2)), L])
            L_ops.append(Lp)
            L2_base.append(Lp.T @ Lp)
    else:
        L_ops = [np.zeros((len(tau), k))] * 3
        L2_base = []
        for order in (0, 1, 2):
            M = np.asarray(construct_M(f_coll, order=order, epsilon=eps))
            Mp = np.zeros((k, k))
            Mp[2:, 2:] = M
            L2_base.append(Mp)

    lb = np.full(k, 0.0)   # nonneg
    ub = np.full(k, np.inf)
    return dict(A_re=A_re, A_im=A_im, WA_re=WA_re, WA_im=WA_im, WT_re=WT_re,
                WT_im=WT_im, L2_base=np.array(L2_base), L_ops=np.array(L_ops),
                L1_vec=np.zeros(k), lb=lb, ub=ub, z_scale=z_scale, tau=tau,
                eps=eps, T_re=Zs.real, T_im=Zs.imag, w=w)


def to_ridge_data(p, reg_frac=(0.0, 0.0, 1.0)):
    return RidgeData(
        WA_re=jnp.asarray(p["WA_re"]), WA_im=jnp.asarray(p["WA_im"]),
        WT_re=jnp.asarray(p["WT_re"]), WT_im=jnp.asarray(p["WT_im"]),
        L2_base=jnp.asarray(p["L2_base"]), L_ops=jnp.asarray(p["L_ops"]),
        L1_vec=jnp.asarray(p["L1_vec"]), reg_frac=jnp.asarray(reg_frac),
        lb=jnp.asarray(p["lb"]), ub=jnp.asarray(p["ub"]))


def test_ordinary_ridge_matches_golden_qp():
    freq, Z = load_spectrum()
    p = build_series_problem(freq, Z)
    data = to_ridge_data(p)
    res = run_ordinary_ridge("both", data, 1e-2)
    # golden: same P, q solved by scipy bounded least squares
    L2 = p["L2_base"][2] * 1e-2
    P = p["WA_re"].T @ p["WA_re"] + p["WA_im"].T @ p["WA_im"] + L2
    q = -p["WA_re"].T @ p["WT_re"] - p["WA_im"].T @ p["WT_im"]
    x_ref = solve_qp_golden(P, q, p["lb"], p["ub"])
    obj = lambda v: 0.5 * v @ P @ v + q @ v
    assert obj(np.asarray(res.coef)) <= obj(x_ref) + 1e-9 * abs(obj(x_ref))
    np.testing.assert_allclose(np.asarray(res.coef), x_ref, atol=2e-4)


@pytest.mark.parametrize("penalty", ["discrete", "integral"])
def test_hyper_lambda_matches_golden(penalty):
    freq, Z = load_spectrum()
    p = build_series_problem(freq, Z, penalty=penalty,
                             weights="modulus" if penalty == "integral" else None)
    reg_frac = (0.0, 0.0, 1.0)
    data = to_ridge_data(p, reg_frac)
    hl_beta = 2.5
    lambda_0 = 1e-2
    cfg = HyperLambdaConfig(part="both", penalty=penalty, n_fixed=2, max_iter=20)
    k = p["WA_re"].shape[1]
    delta_mask = np.ones(k)
    res = run_hyper_lambda(cfg, data, np.full(k, 1e-6), np.full(3, hl_beta),
                           lambda_0, delta_mask=jnp.asarray(delta_mask))

    coef_ref, lam_ref, hist = run_hyper_lambda_golden(
        "both", p["WA_re"], p["WA_im"], p["WT_re"], p["WT_im"], p["L2_base"],
        p["L_ops"], p["L1_vec"], reg_frac, p["lb"], p["ub"], hl_beta, lambda_0,
        penalty=penalty, n_fixed=2, delta_mask=delta_mask)

    coef = np.asarray(res.coef)
    # trajectories may diverge slightly through QP solver differences; compare
    # recovered distributions (physical output), not raw coefficient vectors
    scale = np.abs(coef_ref).max()
    np.testing.assert_allclose(coef, coef_ref, atol=2e-2 * scale)

    # the ITERATION PATH matches as well, not only the (possibly
    # non-converged) iteration-20 point the workloads stop at: after 3
    # iterations — far from any fixed point — coefficients and the full
    # lambda vector agree tightly with the independent implementation, so
    # a "did not converge within 20 iterations" warning leaves both
    # implementations at the SAME intermediate state
    cfg3 = HyperLambdaConfig(part="both", penalty=penalty, n_fixed=2,
                             max_iter=3)
    res3 = run_hyper_lambda(cfg3, data, np.full(k, 1e-6), np.full(3, hl_beta),
                            lambda_0, xtol=0.0,
                            delta_mask=jnp.asarray(delta_mask))
    coef3_ref, lam3_ref, _ = run_hyper_lambda_golden(
        "both", p["WA_re"], p["WA_im"], p["WT_re"], p["WT_im"], p["L2_base"],
        p["L_ops"], p["L1_vec"], reg_frac, p["lb"], p["ub"], hl_beta, lambda_0,
        penalty=penalty, n_fixed=2, delta_mask=delta_mask, max_iter=3,
        xtol=0.0)
    np.testing.assert_allclose(np.asarray(res3.coef), coef3_ref,
                               atol=5e-3 * scale)
    # only order 2 is active (reg_frac); skip the n_fixed offset coords
    np.testing.assert_allclose(np.asarray(res3.lam_vectors[2])[2:],
                               np.asarray(lam3_ref)[2][2:], rtol=2e-2)


def test_hyper_lambda_recovers_zarc_gamma():
    freq, Z = load_spectrum("Z_ZARC_Macdonald_0.25.csv")
    p = build_series_problem(freq, Z, penalty="integral", weights="modulus")
    data = to_ridge_data(p)
    k = p["WA_re"].shape[1]
    cfg = HyperLambdaConfig(part="both", penalty="integral", n_fixed=2)
    res = run_hyper_lambda(cfg, data, np.full(k, 1e-6), np.full(3, 2.5), 1e-2)
    coef = np.asarray(res.coef) * p["z_scale"]

    gt = pd.read_csv("/root/reference/data/simulated/gamma_ZARC.csv")
    Phi = np.exp(-((p["eps"] * np.log(gt["tau"].values[:, None] / p["tau"][None, :])) ** 2))
    gamma = Phi @ coef[2:]
    rmse = np.sqrt(np.mean((gamma - gt["gamma"].values) ** 2))
    rp = np.trapezoid(gt["gamma"].values, np.log(gt["tau"].values))
    assert rmse < 0.05 * rp, f"gamma RMSE {rmse} too large vs Rp {rp}"


def test_hyper_weights_downweights_outliers():
    freq, Z = load_spectrum()
    # corrupt two points
    Zc = Z.copy()
    Zc[20] *= 1.6
    Zc[45] *= 0.5
    p = build_series_problem(freq, Zc, penalty="discrete")
    data = to_ridge_data(p)
    res = run_hyper_weights("both", data, jnp.asarray(p["A_re"]),
                            jnp.asarray(p["A_im"]), jnp.asarray(p["T_re"]),
                            jnp.asarray(p["T_im"]), 1e-2, 2.0,
                            jnp.ones(len(freq)), jnp.ones(len(freq)))
    w = np.asarray(res.weights_re) + np.asarray(res.weights_im)
    # the corrupted points should get the smallest weights
    order = np.argsort(w)
    assert {20, 45} & set(order[:4]), f"outliers not downweighted: {order[:6]}"


def test_hyper_lambda_lm_solution():
    """hl_solution='lm' converges and produces a reasonable recovery
    (reference: inversion.py:650-670)."""
    freq, Z = load_spectrum()
    p = build_series_problem(freq, Z, penalty="discrete")
    data = to_ridge_data(p)
    k = p["WA_re"].shape[1]
    cfg = HyperLambdaConfig(part="both", penalty="discrete", use_lm=True,
                            n_fixed=2, max_iter=20)
    res = run_hyper_lambda(cfg, data, np.full(k, 1e-6), np.full(3, 2.5), 1e-2)
    coef = np.asarray(res.coef) * p["z_scale"]
    gt = pd.read_csv("/root/reference/data/simulated/gamma_ZARC.csv")
    Phi = np.exp(-((p["eps"] * np.log(gt["tau"].values[:, None]
                                      / p["tau"][None, :])) ** 2))
    gamma = Phi @ coef[2:]
    rp = np.trapezoid(gt["gamma"].values, np.log(gt["tau"].values))
    rmse = np.sqrt(np.mean((gamma - gt["gamma"].values) ** 2))
    assert rmse < 0.08 * rp, rmse
    assert np.isfinite(np.asarray(res.lam_vectors)).all()
