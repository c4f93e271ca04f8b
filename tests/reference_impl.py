"""Independent numpy/scipy golden implementations of the kernel formulas.

These are written directly from the mathematical definitions (series DRT
kernel, Song–Bazant diffusion impedances, Gaussian RBF derivative and
penalty closed forms) used by the reference (bayes_drt/matrices.py), and act
as float64 ground truth for the vectorized JAX implementations.
"""

import numpy as np


def gaussian(y, eps):
    return np.exp(-((eps * y) ** 2))


def drt_integrand(y, w, t, eps, part):
    u = y + np.log(w * t)
    if part == "real":
        return gaussian(y, eps) / (1.0 + np.exp(2.0 * u))
    return -gaussian(y, eps) * np.exp(y) * w * t / (1.0 + np.exp(2.0 * u))


def zd(y, w, t, symmetry, bc, ct=False, k_ct=None):
    if ct:
        x = np.sqrt(t * np.exp(y) * (k_ct + 1j * w))
    else:
        x = np.sqrt(1j * w * t * np.exp(y))
    if bc == "blocking" and symmetry == "planar":
        return 1.0 / (np.tanh(x) * x)
    if bc == "blocking" and symmetry == "spherical":
        # x - tanh(x) suffers catastrophic cancellation for small |x|; use
        # 80-bit extended precision so the golden value is trustworthy
        # (the JAX implementation uses a series expansion and is verified
        # against mpmath to ~1e-14 there).
        xl = x.astype(np.clongdouble)
        tl = np.tanh(xl)
        return (tl / (xl - tl)).astype(np.complex128)
    if bc == "transmissive" and symmetry == "planar":
        return np.tanh(x) / x
    raise ValueError((bc, symmetry))


def ddt_integrand(y, w, t, eps, part, dist_type, symmetry, bc, ct=False, k_ct=None):
    z = zd(y, w, t, symmetry, bc, ct, k_ct)
    val = 1.0 / z if dist_type == "parallel" else z
    return gaussian(y, eps) * (val.real if part == "real" else val.imag)


def construct_A_golden(freq, part, tau=None, eps=1.0, kernel="DRT", dist_type="series",
                       symmetry="planar", bc="transmissive", ct=False, k_ct=None,
                       n_quad=1000, y_max=20.0):
    freq = np.asarray(freq, dtype=float)
    omega = 2 * np.pi * freq
    if tau is None:
        tau = 1.0 / omega
    tau = np.asarray(tau, dtype=float)
    y = np.linspace(-y_max, y_max, n_quad)
    A = np.empty((len(omega), len(tau)))
    with np.errstate(over="ignore", invalid="ignore"):
        for n, w in enumerate(omega):
            for m, t in enumerate(tau):
                if kernel == "DRT":
                    f = drt_integrand(y, w, t, eps, part)
                else:
                    f = ddt_integrand(y, w, t, eps, part, dist_type, symmetry, bc, ct, k_ct)
                f = np.nan_to_num(f, posinf=0.0, neginf=0.0)
                A[n, m] = np.trapezoid(f, y)
    return A


def construct_L_golden(freq, tau=None, eps=1.0, order=1):
    freq = np.asarray(freq, dtype=float)
    omega = 2 * np.pi * freq
    if tau is None:
        tau = 1.0 / omega
    tau = np.asarray(tau, dtype=float)
    y = np.log(1.0 / (omega[:, None] * tau[None, :]))
    g = np.exp(-((eps * y) ** 2))
    if order == 0:
        return g
    if order == 1:
        return -2 * eps**2 * y * g
    if order == 2:
        return (-2 * eps**2 + 4 * eps**4 * y**2) * g
    if order == 3:
        return (12 * eps**4 * y - 8 * eps**6 * y**3) * g
    if isinstance(order, (list, tuple)):
        f0, f1, f2 = order
        return (f0 * g + f1 * (-2 * eps**2 * y * g)
                + f2 * (-2 * eps**2 + 4 * eps**4 * y**2) * g)
    raise ValueError(order)


def construct_M_golden(freq, order=1, eps=1.0):
    freq = np.asarray(freq, dtype=float)
    omega = 2 * np.pi * freq
    tau = 1.0 / omega
    a = eps * np.log(1.0 / (omega[:, None] * tau[None, :]))
    root = np.sqrt(np.pi / 2)
    g = np.exp(-(a**2) / 2)
    if order == 0:
        return root / eps * g
    if order == 1:
        return -root * eps * (-1 + a**2) * g
    if order == 2:
        return root * eps**3 * (3 - 6 * a**2 + a**4) * g
    raise ValueError(order)
