"""Running metrics (utils/common_utils.py:128-157 counterpart)."""

from __future__ import annotations

from collections import deque

import numpy as np


class AverageMeter:
    """Running average; with `length` > 0 a sliding window, else cumulative."""

    def __init__(self, length: int = 0):
        self.length = length
        self.reset()

    def reset(self):
        self._window = deque(maxlen=self.length) if self.length > 0 else None
        self.count = 0
        self.sum = 0.0
        self.val = 0.0
        self.avg = 0.0

    def update(self, val: float, num: int = 1):
        self.val = val
        if self._window is not None:
            assert num == 1
            self._window.append(val)
            self.avg = float(np.mean(self._window))
        else:
            self.sum += val * num
            self.count += num
            self.avg = self.sum / self.count


def psnr(a: np.ndarray, b: np.ndarray, max_val: float = 1.0) -> float:
    """PSNR between two [0,1] images (quality-parity metric, SURVEY.md §6)."""
    mse = float(np.mean((np.asarray(a, np.float64) - np.asarray(b, np.float64)) ** 2))
    if mse == 0:
        return float("inf")
    return 10.0 * np.log10(max_val**2 / mse)
