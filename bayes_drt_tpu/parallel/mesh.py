"""Device mesh helpers for sharded batch inversion.

The natural mesh for this workload is ('spectra', 'chains'): spectra are
independent, chains within a spectrum are independent, so both axes shard
without any in-fit collectives — ICI traffic is limited to result gathers.
(See SURVEY.md section 2.10: the reference's only parallelism is per-chain OS
processes and a serial spectra loop.)
"""

from __future__ import annotations

import numpy as np

import jax
from jax.sharding import Mesh


def make_mesh(n_devices: int | None = None, chains_axis: int = 1) -> Mesh:
    """Mesh over available devices with axes ('spectra', 'chains').

    chains_axis devices are assigned to the chains dimension (default 1:
    all devices parallelize spectra, chains run sequentially-vmapped within
    a device — usually the right call since B >> chains).
    """
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    n = len(devices)
    if n % chains_axis != 0:
        raise ValueError(f"{n} devices not divisible by chains_axis={chains_axis}")
    arr = np.array(devices).reshape(n // chains_axis, chains_axis)
    return Mesh(arr, axis_names=("spectra", "chains"))
