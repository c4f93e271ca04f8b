"""Log-density building blocks (Stan-compatible lpdfs).

Constants are kept so log-posterior values are comparable across
implementations; Stan drops additive constants but MAP/NUTS are invariant to
them.
"""

from __future__ import annotations

import math

import jax.numpy as jnp
from jax.scipy.special import gammaln

# Python float, NOT a jnp array: a module-level jnp constant would initialize
# the JAX backend at import time, before an embedder can configure the
# platform (e.g. the driver's dryrun_multichip forcing CPU + virtual devices).
_LOG_SQRT_2PI = 0.5 * math.log(2.0 * math.pi)


def normal_lpdf(x, mu, sigma):
    z = (x - mu) / sigma
    return jnp.sum(-0.5 * z * z - jnp.log(sigma) - _LOG_SQRT_2PI)


def std_normal_lpdf(x):
    return jnp.sum(-0.5 * x * x - _LOG_SQRT_2PI)


def inv_gamma_lpdf(x, alpha, beta):
    """Stan inv_gamma(alpha, beta): alpha*log(beta) - lgamma(alpha)
    - (alpha+1)*log(x) - beta/x."""
    return jnp.sum(alpha * jnp.log(beta) - gammaln(alpha)
                   - (alpha + 1.0) * jnp.log(x) - beta / x)


def exponential_lpdf(x, lam):
    return jnp.sum(jnp.log(lam) - lam * x)
