import numpy as np
import pandas as pd
import pytest

from bayes_drt_tpu import Inverter


def test_phase_offset_correction_recovers_offsets():
    """Inject artificial phase steps at current-range changes; the corrected
    fit should remove them."""
    df = pd.read_csv("/root/reference/data/simulated/Z_ZARC_Macdonald_0.25.csv")
    freq = df["Freq"].values
    Z = df["Zreal"].values + 1j * df["Zimag"].values
    n = len(freq)
    # three current ranges (descending frequency order of the file)
    ier = np.zeros(n, dtype=int)
    ier[:30] = 2
    ier[30:60] = 1
    # inject a phase offset on the middle range
    true_offset = 1.5  # degrees
    zphz = np.angle(Z, deg=True)
    zphz_corrupt = zphz.copy()
    zphz_corrupt[30:60] += true_offset
    zmod = np.abs(Z)
    Zc = zmod * np.cos(np.radians(zphz_corrupt)) + 1j * zmod * np.sin(np.radians(zphz_corrupt))

    inv = Inverter()
    inv.ridge_fit(freq, Zc, correct_phase_offset=True, IERange=ier,
                  lambda_phz=0.1, penalty="integral", hyper_lambda=True,
                  weights="modulus")
    assert hasattr(inv, "phase_offsets")
    # the injected offset must be recovered (sign-flipped correction)
    assert abs(phase_correction_for_offset(inv.phase_offsets) + true_offset) < 0.2
    # corrected impedance closer to the clean data than the corrupted input
    err_corrected = np.mean(np.abs(inv.Z_adjusted - Z) / np.abs(Z))
    err_corrupt = np.mean(np.abs(Zc - Z) / np.abs(Z))
    assert err_corrected < 0.2 * err_corrupt


def phase_correction_for_offset(offsets):
    """The largest-magnitude recovered offset (the injected step)."""
    return offsets[np.argmax(np.abs(offsets))]


def test_phase_offset_requires_ierange():
    df = pd.read_csv("/root/reference/data/simulated/Z_ZARC_Macdonald_0.25.csv")
    freq = df["Freq"].values
    Z = df["Zreal"].values + 1j * df["Zimag"].values
    inv = Inverter()
    with pytest.raises(ValueError):
        inv.ridge_fit(freq, Z, correct_phase_offset=True)
