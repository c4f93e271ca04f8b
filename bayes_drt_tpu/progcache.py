"""Cross-call cache for jitted programs.

Rebuilding jit closures on every fit call makes jax re-trace the whole
program each time (seconds of Python tracing; only XLA compilation is
cached by jax itself). Callers key the cache on everything that shapes the
traced computation — model config, array shapes/dtypes, solver budgets,
mesh — and pass array VALUES as arguments, so one cached program serves
every call with the same structure.
"""

from __future__ import annotations

_PROGRAM_CACHE: dict = {}
_PROGRAM_CACHE_MAX = 128


def cached_program(key, builder):
    fn = _PROGRAM_CACHE.get(key)
    if fn is None:
        if len(_PROGRAM_CACHE) >= _PROGRAM_CACHE_MAX:
            _PROGRAM_CACHE.pop(next(iter(_PROGRAM_CACHE)))
        fn = builder()
        _PROGRAM_CACHE[key] = fn
    return fn


def data_shapes(tree):
    """Shape/dtype signature of a pytree of arrays/scalars, for cache keys.

    Leaves may be jax/numpy arrays or plain Python scalars (e.g. ridge-init
    values computed with float arithmetic); np.shape/np.result_type cover
    both."""
    import jax
    import numpy as np
    return tuple((np.shape(a), str(np.result_type(a)))
                 for a in jax.tree.leaves(tree))


def precise_matmuls(fn):
    """Trace ``fn`` under full-float32 matmul precision.

    TPUs lower f32 dot/einsum to bf16 MXU passes by default; for this
    library's solvers that is NOT harmless numerics: the bf16 gradient
    noise destabilizes NUTS leapfrog integration (measured on the bench
    batch: logp split-Rhat p50 24.7 -> 2.0 and recovered-gamma RMSE
    0.0159 -> 0.0056 of Rp when forced to float32, at ~12% run-time cost).
    Every jitted solver body is wrapped with this so TPU results match
    CPU-quality sampling by default. No effect on float64 or CPU.
    """
    import functools

    import jax

    @functools.wraps(fn)
    def wrapped(*args, **kwargs):
        with jax.default_matmul_precision("highest"):
            return fn(*args, **kwargs)

    return wrapped
