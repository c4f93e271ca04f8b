import glob
import time

import numpy as np
import pandas as pd
import pytest

from bayes_drt_tpu import native
from bayes_drt_tpu.io import get_fZ, read_eis

CSV = "/root/reference/data/simulated/Z_ZARC_Macdonald_0.25.csv"
DTA = "/root/reference/data/experimental/550C.0.5V.DTA"


def test_native_available():
    assert native.available(), "g++ toolchain expected in this image"


def test_csv_matches_pandas():
    freq, Z = native.load_eis_file(CSV)
    df = pd.read_csv(CSV)
    np.testing.assert_allclose(freq, df["Freq"].values)
    np.testing.assert_allclose(Z.real, df["Zreal"].values)
    np.testing.assert_allclose(Z.imag, df["Zimag"].values)


def test_gamry_matches_python_parser():
    freq, Z = native.load_eis_file(DTA)
    f_ref, z_ref = get_fZ(read_eis(DTA, warn=False))
    np.testing.assert_allclose(freq, f_ref)
    np.testing.assert_allclose(Z, z_ref)


def test_bucketing():
    files = sorted(glob.glob("/root/reference/data/simulated/Z_*uniform*.csv"))
    buckets = native.load_spectra(files)
    assert sum(b["Z"].shape[0] for b in buckets) == len(files)
    for b in buckets:
        assert b["Z"].shape == (len(b["paths"]), len(b["freq"]))
        # every spectrum in a bucket shares the grid
        assert np.isfinite(b["Z"]).all()


def test_native_faster_than_pandas():
    files = sorted(glob.glob("/root/reference/data/simulated/Z_*.csv"))[:40]
    native.load_eis_file(files[0])  # warm build
    t0 = time.time()
    for f in files:
        native.load_eis_file(f)
    t_native = time.time() - t0
    t0 = time.time()
    for f in files:
        df = pd.read_csv(f)
        df["Zreal"].values + 1j * df["Zimag"].values
    t_pandas = time.time() - t0
    # should beat pandas comfortably; assert non-embarrassing
    assert t_native < t_pandas, (t_native, t_pandas)
