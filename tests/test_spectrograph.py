"""Spectrograph end-to-end regression (the fork's flagship application,
reference scripts/spectrograph/ + real-data.csv RMSE anchors)."""
import numpy as np
import pytest

from mitsuba3_plt_tpu.experiments.spectrograph import (
    gen_srfs, run_spectrograph, _lobe_direction,
)


def test_gen_srfs_partition():
    centers, grid, curves = gen_srfs(8)
    assert curves.shape == (8, 64)
    # each curve peaks at its center
    peak_wl = grid[curves.argmax(axis=1)]
    np.testing.assert_allclose(peak_wl, centers, atol=(grid[1] - grid[0]))


def test_lobe_direction_wavelength_monotone():
    # lobe (2,0) direction sweeps monotonically with wavelength
    xs = []
    for wl in [450.0, 550.0, 650.0]:
        d, ok = _lobe_direction(wl)
        assert ok
        xs.append(d[0] / np.linalg.norm(d))
    assert xs[0] < xs[1] < xs[2]


@pytest.mark.slow
def test_blackbody_recovery():
    out = run_spectrograph(
        n_sensors=6, spp=192, seed=0,
        spectrum={"type": "blackbody", "temperature": 3000.0},
    )
    assert out["rmse"] < 0.1, out["rmse"]
