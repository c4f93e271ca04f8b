from .chees import ChEESConfig, SHMCConfig, sample_chees, sample_shmc
from .diagnostics import e_bfmi, ess, ess_jnp, rhat, summary
from .map import run_lbfgs, run_lbfgs_restarts
from .nnls import solve_nnls, solve_qp_box
from .nuts import NUTSConfig, sample_nuts
from .ridge import (HyperLambdaConfig, RidgeData, run_hyper_lambda,
                    run_hyper_weights, run_ordinary_ridge)

__all__ = ["ChEESConfig", "SHMCConfig", "sample_chees", "sample_shmc",
           "e_bfmi", "ess", "ess_jnp", "rhat", "summary",
           "run_lbfgs", "run_lbfgs_restarts", "solve_nnls", "solve_qp_box",
           "NUTSConfig", "sample_nuts", "HyperLambdaConfig", "RidgeData",
           "run_hyper_lambda", "run_hyper_weights", "run_ordinary_ridge"]
