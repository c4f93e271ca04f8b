import numpy as np
import pytest
from scipy.optimize import nnls as scipy_nnls

import jax.numpy as jnp

from bayes_drt_tpu.infer.nnls import solve_nnls, solve_qp_box


def make_ls_qp(rng, n=60, k=40, reg=1e-6):
    A = rng.standard_normal((n, k))
    b = rng.standard_normal(n)
    P = A.T @ A + reg * np.eye(k)
    q = -A.T @ b
    return A, b, P, q


def test_nnls_matches_scipy(rng):
    A, b, P, q = make_ls_qp(rng)
    x = np.asarray(solve_nnls(jnp.asarray(P), jnp.asarray(q)).x)
    x_ref, _ = scipy_nnls(A, b)
    # scipy solves min ||Ax-b|| s.t. x>=0 (without the tiny reg); compare
    # objective values rather than coordinates (solution may be degenerate)
    def obj(v):
        return 0.5 * v @ P @ v + q @ v
    assert obj(x) <= obj(x_ref) + 1e-8 * abs(obj(x_ref))
    np.testing.assert_allclose(x, x_ref, atol=5e-5)
    assert x.min() >= -1e-12


def test_unconstrained_interior_solution(rng):
    # with very loose bounds the solution must equal the linear solve
    _, _, P, q = make_ls_qp(rng)
    x = np.asarray(solve_qp_box(jnp.asarray(P), jnp.asarray(q), -1e6, 1e6).x)
    x_ref = np.linalg.solve(P, -q)
    np.testing.assert_allclose(x, x_ref, rtol=1e-6, atol=1e-8)


def test_box_constraints_respected(rng):
    _, _, P, q = make_ls_qp(rng)
    lb, ub = -0.1, 0.2
    x = np.asarray(solve_qp_box(jnp.asarray(P), jnp.asarray(q), lb, ub).x)
    assert x.min() >= lb - 1e-10
    assert x.max() <= ub + 1e-10
    # KKT: gradient must push outward at active bounds, ~zero at free coords
    g = P @ x + q
    free = (x > lb + 1e-8) & (x < ub - 1e-8)
    if free.any():
        assert np.abs(g[free]).max() < 1e-6


def test_reference_mixed_bounds(rng):
    # the reference's nonneg=False case: x >= -10 except first two coords >= 0
    # (inversion.py:1058-1064)
    _, _, P, q = make_ls_qp(rng, k=30)
    k = P.shape[0]
    lb = np.full(k, -10.0)
    lb[:2] = 0.0
    ub = np.full(k, np.inf)
    x = np.asarray(solve_qp_box(jnp.asarray(P), jnp.asarray(q),
                                jnp.asarray(lb), jnp.asarray(ub)).x)
    assert (x[:2] >= -1e-12).all()
    assert (x >= -10 - 1e-10).all()


def test_vmapped_batch(rng):
    import jax
    Ps, qs = [], []
    for _ in range(8):
        _, _, P, q = make_ls_qp(rng, k=25)
        Ps.append(P)
        qs.append(q)
    Ps, qs = jnp.asarray(np.array(Ps)), jnp.asarray(np.array(qs))
    batched = jax.vmap(lambda P, q: solve_nnls(P, q).x)(Ps, qs)
    for i in range(8):
        single = solve_nnls(Ps[i], qs[i]).x
        np.testing.assert_allclose(np.asarray(batched[i]), np.asarray(single),
                                   rtol=1e-10, atol=1e-12)


def test_ill_conditioned_rbf_like(rng):
    # Gaussian RBF Gram-like matrix: realistic ill-conditioning for DRT
    t = np.linspace(0, 10, 50)
    K = np.exp(-((t[:, None] - t[None, :]) ** 2))
    b = K @ np.abs(rng.standard_normal(50))
    P = K.T @ K + 1e-8 * np.eye(50)
    q = -K.T @ b
    x = np.asarray(solve_nnls(jnp.asarray(P), jnp.asarray(q)).x)
    x_ref, _ = scipy_nnls(K, b)
    def obj(v):
        return 0.5 * v @ P @ v + q @ v
    assert obj(x) <= obj(x_ref) + 1e-6 * abs(obj(x_ref)) + 1e-12


def test_f32_extreme_column_scaling(rng):
    """Regression: a wide-dynamic-range spectrum (real PDAC instrument data)
    produces normal matrices with cond ~1e12+ whose f32 Cholesky NaN'd
    outright — and the NaN masqueraded as instant 'convergence' (no
    violations). Jacobi equilibration + f32 diagonal jitter fix it; this
    synthetic QP reproduces the failure shape."""
    A, b, P, q = make_ls_qp(rng, n=80, k=50, reg=1e-10)
    # column scales spanning 6 orders of magnitude, like the weighted
    # inductance column vs unit-scale RBF columns
    s = np.logspace(-3, 3, 50)
    P = s[:, None] * P * s[None, :]
    q = s * q
    r = solve_nnls(jnp.asarray(P, jnp.float32), jnp.asarray(q, jnp.float32))
    x = np.asarray(r.x)
    assert np.isfinite(x).all()
    assert bool(r.converged)
    # solution matches the f64 solve in well-determined coordinates
    x64 = np.asarray(solve_nnls(jnp.asarray(P), jnp.asarray(q)).x)
    def obj(v):
        return 0.5 * v @ P @ v + q @ v
    assert obj(x) <= obj(x64) + 1e-4 * abs(obj(x64))
