"""Golden numpy implementation of the hierarchical-ridge iteration, written
from the reference's update formulas (bayes_drt/inversion.py:489-753,
947-983) with the QP solved by scipy bounded least squares instead of cvxopt.
Used to validate the jitted JAX engine trajectory-for-trajectory.
"""

import numpy as np
from scipy.optimize import lsq_linear


def solve_qp_golden(P, q, lb, ub):
    # 0.5 x'Px + q'x = 0.5||Rx + R^-T q||^2 + const with P = R'R
    R = np.linalg.cholesky(P).T
    b = -np.linalg.solve(R.T, q)
    res = lsq_linear(R, b, bounds=(lb, ub), tol=1e-14, max_iter=500)
    return res.x


def hyper_lambda_discrete_golden(L, coef, hl_beta, lambda_0):
    Lx2 = (L @ coef) ** 2
    return 1.0 / (Lx2 / (hl_beta - 1) + 1.0 / lambda_0)


def hyper_lambda_fbeta_golden(L, coef, hl_fbeta, lambda_0):
    Lx2 = (L @ coef) ** 2
    return lambda_0 / (Lx2 / (np.max(Lx2) * hl_fbeta) + 1.0)


def hyper_lambda_integral_golden(M, coef, lam_vec, hl_beta, lambda_0):
    X = np.diag(coef)
    xlm = X @ np.diag(np.sqrt(lam_vec)) @ M @ X
    xlm = xlm - np.diag(np.diagonal(xlm))
    C = np.sum(xlm, axis=0)
    a = hl_beta / 2
    b = 0.5 * (2 * a - 2) / lambda_0
    d = coef**2 * np.diagonal(M) + 2 * b
    lam = (C**2 - np.sign(C) * C * np.sqrt(4 * d * (2 * a - 2) + C**2)
           + 2 * d * (2 * a - 2)) / (2 * d**2)
    return lam


def run_hyper_lambda_golden(part, WA_re, WA_im, WT_re, WT_im, L2_base, L_ops,
                            L1_vec, reg_frac, lb, ub, hl_beta, lambda_0,
                            penalty="discrete", n_fixed=0, hl_fbeta=None,
                            max_iter=20, xtol=1e-3, delta_mask=None):
    k = WA_re.shape[1]
    hl_beta = np.broadcast_to(np.asarray(hl_beta, float), (3,))
    a_list = hl_beta / 2
    if penalty == "integral":
        b_list = 0.5 * (2 * a_list - 2) / lambda_0
        lam0s = (2 * a_list - 2) / (2 * b_list)
    else:
        b_list = 0.5 * (2 * a_list - 1) / lambda_0
        lam0s = (2 * a_list - 1) / (2 * b_list)
    betas = 2 * a_list
    if delta_mask is None:
        delta_mask = np.ones(k)

    coef = np.full(k, 1e-6)
    lam_vectors = [np.full(k, lambda_0) for _ in range(3)]
    history = []
    for it in range(max_iter):
        prev = coef.copy()
        for n in range(3):
            if reg_frac[n] <= 0:
                continue
            if penalty == "integral":
                factor = [100.0, 10.0, 1.0][n]
                lv = hyper_lambda_integral_golden(
                    L2_base[n], factor * prev, lam_vectors[n],
                    np.full(k, betas[n]), np.full(k, lam0s[n]))
                lv[lv <= 0] = 1e-15
                lam_vectors[n] = lv
            elif hl_fbeta is not None:
                lv = hyper_lambda_fbeta_golden(L_ops[n], prev, hl_fbeta, lambda_0)
                lam_vectors[n] = np.concatenate([np.ones(n_fixed), lv])
            else:
                lv = hyper_lambda_discrete_golden(L_ops[n], prev, betas[n], lam0s[n])
                lam_vectors[n] = np.concatenate([np.ones(n_fixed), lv])

        L2_mat = np.zeros((k, k))
        for n in range(3):
            if reg_frac[n] > 0:
                lm = np.diag(np.sqrt(lam_vectors[n]))
                L2_mat += reg_frac[n] * (lm @ L2_base[n] @ lm)
        if part == "both":
            P = WA_re.T @ WA_re + WA_im.T @ WA_im + L2_mat
            q = -WA_re.T @ WT_re - WA_im.T @ WT_im + L1_vec
        elif part == "real":
            P = WA_re.T @ WA_re + L2_mat
            q = -WA_re.T @ WT_re + L1_vec
        else:
            P = WA_im.T @ WA_im + L2_mat
            q = -WA_im.T @ WT_im + L1_vec
        coef = solve_qp_golden(P, q, lb, ub)
        history.append(coef.copy())
        delta = np.mean(np.abs((coef - prev) / np.where(np.abs(prev) > 0, prev, 1.0)
                               * delta_mask))
        if delta < xtol:
            break
    return coef, lam_vectors, history
