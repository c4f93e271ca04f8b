"""Measured-losing or exploratory arms, kept importable but fenced.

Every entry here was built, tested, and A/B-measured on real TPU hardware
against the production path — and LOST (or stayed neutral). They ride in
the package because the measurements are part of the engineering record and
because each is the natural starting point if the runtime's performance
characteristics change (new XLA release, new chip generation). None of them
is reachable from a default-configured production fit; all remain covered
by the test suite.

ADRs (what was measured, why kept):

**ChEES-HMC** (`sample_chees`, `ChEESConfig`; `Inverter.fit(sampler='chees')`
and `fit_spectra_batch(sampler='chees')` route here).
Adaptive trajectory-length HMC (Hoffman et al. 2021). Measured round 3,
B=512 DRT batch, back-to-back vs NUTS: equal speed at worse quality — the
per-chain/per-spectrum trajectory lengths diverge under vmap so every draw
costs the BATCH MAX of the while_loop trip counts (mean n_leap 23, paying
~50-64), and endpoint-MH acceptance is fragile in the ups-funnel (one
divergent endpoint rejects the whole draw). Kept: the warmup machinery
(per-chain step-size adaptation) is shared with the production SHMC, and
ChEES is the right sampler for posteriors without the funnel geometry.

**NUTSConfig(fused_draws=True)** (`bayes_drt_tpu.infer.nuts`).
One persistent while_loop per whole chain instead of one per draw. Measured
round 2: 1.8x SLOWER than flat_tree at equal draws (per-leapfrog masked
dual-averaging/draw-write bookkeeping outweighs the per-draw sync it
saves); compiles through the remote tunnel take ~9 min even at tiny shapes.
Kept: API completeness; it is the canonical "no host sync at all" form.

**SHMCConfig(pallas_traj=True)** and **SHMCConfig(flat_chain=True)**
(`bayes_drt_tpu.infer.shmc_flat`, `sample_shmc_flat`).
The whole n-leapfrog trajectory as one fused Pallas kernel with the chain
state VMEM-resident (pallas_traj), and the identical flat (B*C, D) layout
with an XLA scan trajectory (flat_chain) to split kernel-vs-layout effects.
Measured round 3 (benchmarks/ab_pallas.py, B=512 n32, back-to-back):
pallas_traj 13.9k spectra/min vs the tuned generic XLA path 15.9-16.4k
(-13%); flat_chain 15.2-15.3k (-5%) — so the deficit is part layout (the
flat axis defeats XLA scheduling the per-spectrum vmap gets), part kernel
(traj_block > 256 overflows the 16 MB VMEM budget at flagship D~211).
Kept: the hand-written `flat_value_and_grad` is the only from-first-
principles check of the posterior gradient, and the kernel is the template
if a future Mosaic release changes the VMEM economics.

**Pallas quadrature kernel** (`construct_A_drt_pallas`,
`bayes_drt_tpu.ops.pallas_quad`).
Fused (N, K, Q) DRT A-matrix quadrature as a Pallas kernel. VALIDATED on
real TPU (<1e-6 vs the XLA einsum path, both parts) but SLOWER at
production sizes (81x90: 59 ms vs 27 ms per call) and the A-build is
one-time host-side setup anyway. Kept: it is the worked Pallas example for
this codebase and the starting point for any future on-device matrix
rebuild (e.g. per-spectrum frequency grids).

Production API: `fit_spectra_batch(sampler='shmc')` (bench default) and
`sampler='nuts'` (Stan-equivalent). Everything imported below is
experimental.
"""

from ..infer.chees import ChEESConfig, sample_chees
from ..infer.shmc_flat import (FlatShared, FlatSpec, flat_shared_for,
                               flat_spec_for, flat_value_and_grad,
                               sample_shmc_flat)
from ..ops.pallas_quad import construct_A_drt_pallas

__all__ = [
    "ChEESConfig", "sample_chees",
    "FlatShared", "FlatSpec", "flat_shared_for", "flat_spec_for",
    "flat_value_and_grad", "sample_shmc_flat",
    "construct_A_drt_pallas",
]
