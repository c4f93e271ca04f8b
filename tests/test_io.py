import numpy as np
import pandas as pd
import pytest

from bayes_drt_tpu.io import (construct_eis_df, get_file_source, get_fZ,
                              get_timestamp, read_eis)

GAMRY_FILE = "/root/reference/data/experimental/550C.0.5V.DTA"
TXT_FILE = "/root/reference/data/experimental/PDAC_COM3_02109_Contact10_2065C_500C.txt"


def test_get_file_source_gamry():
    assert get_file_source(GAMRY_FILE) == "gamry"


def test_read_eis_gamry():
    df = read_eis(GAMRY_FILE)
    for col in ("Freq", "Zreal", "Zimag", "Zmod", "Zphz"):
        assert col in df.columns, col
    assert len(df) > 10
    freq, Z = get_fZ(df)
    assert np.isfinite(freq).all()
    assert np.isfinite(Z).all()
    # modulus consistency
    np.testing.assert_allclose(np.abs(Z), df["Zmod"].values, rtol=1e-3)


def test_read_eis_txt_gamry_format():
    # the PDAC experimental .txt files are Gamry-format too
    df = read_eis(TXT_FILE, warn=False)
    assert "Freq" in df.columns
    assert len(df) > 10


def test_timestamp():
    ts = get_timestamp(GAMRY_FILE)
    assert 2000 < ts.year < 2100


def test_construct_eis_df_roundtrip():
    f = np.logspace(5, -1, 20)
    Z = 1.0 + 2.0 / (1 + 1j * f * 1e-3)
    df = construct_eis_df(f, Z)
    f2, Z2 = get_fZ(df)
    np.testing.assert_allclose(f, f2)
    np.testing.assert_allclose(Z, Z2)
    np.testing.assert_allclose(df["Zmod"], np.abs(Z))


def test_tutorial3_outlier_file_fit():
    """The Tutorial 3 workload file loads and ridge-fits cleanly."""
    from bayes_drt_tpu import Inverter
    df = read_eis(TXT_FILE, warn=False)
    freq, Z = get_fZ(df)
    inv = Inverter()
    inv.ridge_fit(freq, Z, preset="Huang")
    assert inv.score(freq, Z, metric="r2") > 0.95
