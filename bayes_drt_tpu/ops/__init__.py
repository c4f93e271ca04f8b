from .basis import get_basis_func, gaussian_rbf, gaussian_rbf_dy
from .matrices import construct_A, construct_L, construct_M, get_tau_basis, default_epsilon

__all__ = [
    "get_basis_func",
    "gaussian_rbf",
    "gaussian_rbf_dy",
    "construct_A",
    "construct_L",
    "construct_M",
    "get_tau_basis",
    "default_epsilon",
]
