"""Fixed camera rigs used by the dataset layouts.

The reference hardcodes two rigs:
  * 16 views at elevation 30deg, azimuths in 22.5deg steps, dist 1.5,
    y-up look_at with azim+90deg, NDC focal 2.1875 = 35mm lens / (32mm/2)
    sensor (dataset/gso_test.py:48-56,116-149, wild_test.py:50-58).
  * 64 Objaverse renders over 8 elevation rings x 8-16 azimuths
    (dataset/objaverse.py:10-34,191-225); training uses the 16-view ring at
    elevation 30deg (indices 40..55, objaverse.py:94-99).
"""

from __future__ import annotations

import numpy as np

from mvdfusion_tpu.geometry.cameras import look_at_view_transform

FOCAL_NDC = 35.0 * 2.0 / 32.0  # 2.1875
RIG_DIST = 1.5

AZIMUTHS_16 = np.arange(16) * (2.0 * np.pi / 16.0)
ELEVATIONS_16 = np.full(16, np.deg2rad(30.0))

# Objaverse 64-view grid: elevation rings at -10,0(x16),10,20,30(x16),40 deg
_ELEV_DEG = [-10.0] * 8 + [0.0] * 16 + [10.0] * 8 + [20.0] * 8 + [30.0] * 16 + [40.0] * 8
_AZIM = (
    list((np.arange(8) + 0.5) * (2 * np.pi / 8))[:8]
    + list(np.arange(16) * (2 * np.pi / 16))
    + list((np.arange(8) + 0.5) * (2 * np.pi / 8))
    + list(np.arange(8) * (2 * np.pi / 8))
    + list(np.arange(16) * (2 * np.pi / 16))
    + list((np.arange(8) + 0.5) * (2 * np.pi / 8))
)
AZIMUTHS_B64 = np.asarray(_AZIM)
ELEVATIONS_B64 = np.deg2rad(np.asarray(_ELEV_DEG))

# the fixed-elevation training slice: the 16-view ring at 30deg elevation
OBJAVERSE_TRAIN_RING = np.arange(40, 56)


def fixed_rig(azimuths: np.ndarray, elevations: np.ndarray, dist: float = RIG_DIST):
    """R, T, f, c for the y-up rig: look_at(azim_deg + 90, elev_deg)."""
    R, T = look_at_view_transform(
        dist=dist,
        azim=np.rad2deg(azimuths) + 90.0,
        elev=np.rad2deg(elevations),
        up=(0.0, 1.0, 0.0),
    )
    n = len(R)
    f = np.full((n, 2), FOCAL_NDC, np.float32)
    c = np.zeros((n, 2), np.float32)
    return R, T, f, c
