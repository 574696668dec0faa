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


def _gaussian_kernel(size: int = 11, sigma: float = 1.5) -> np.ndarray:
    x = np.arange(size, dtype=np.float64) - (size - 1) / 2
    g = np.exp(-(x**2) / (2 * sigma**2))
    return g / g.sum()


def _filter2(img: np.ndarray, k: np.ndarray) -> np.ndarray:
    """Separable 'valid' gaussian filter over the leading two axes of
    (H, W, C) via matmuls (numpy, host-side metric code)."""
    n = len(k)
    H, W = img.shape[:2]
    # (H-n+1, H) and (W-n+1, W) banded convolution matrices
    My = np.zeros((H - n + 1, H))
    Mx = np.zeros((W - n + 1, W))
    for i in range(n):
        My[np.arange(H - n + 1), np.arange(H - n + 1) + i] += k[i]
        Mx[np.arange(W - n + 1), np.arange(W - n + 1) + i] += k[i]
    out = np.einsum("oh,hwc->owc", My, img)
    return np.einsum("ow,hwc->hoc", Mx, out)


def ssim(a: np.ndarray, b: np.ndarray, max_val: float = 1.0) -> float:
    """Standard single-scale SSIM (Wang et al. 2004: 11x11 gaussian
    sigma=1.5, K1=0.01, K2=0.03), averaged over channels.

    Inputs (H, W, C) or (B, H, W, C) in [0, max_val].
    """
    a = np.asarray(a, np.float64)
    b = np.asarray(b, np.float64)
    if a.ndim == 4:
        return float(np.mean([ssim(x, y, max_val) for x, y in zip(a, b)]))
    k = _gaussian_kernel()
    c1 = (0.01 * max_val) ** 2
    c2 = (0.03 * max_val) ** 2
    mu_a = _filter2(a, k)
    mu_b = _filter2(b, k)
    var_a = _filter2(a * a, k) - mu_a**2
    var_b = _filter2(b * b, k) - mu_b**2
    cov = _filter2(a * b, k) - mu_a * mu_b
    s = ((2 * mu_a * mu_b + c1) * (2 * cov + c2)) / (
        (mu_a**2 + mu_b**2 + c1) * (var_a + var_b + c2)
    )
    return float(np.mean(s))


def perceptual_distance(a: np.ndarray, b: np.ndarray) -> float:
    """Documented LPIPS substitute: 1 - multi-scale SSIM (3 dyadic scales).

    True LPIPS needs pretrained AlexNet/VGG features, which cannot be
    downloaded in this offline environment; MS-SSIM distance is the standard
    reference-free perceptual stand-in and is monotonically comparable for
    the same-model parity tracking BASELINE.md asks for. Lower is better.
    """
    a = np.asarray(a, np.float64)
    b = np.asarray(b, np.float64)
    vals = []
    for _ in range(3):
        vals.append(ssim(a, b))
        if min(a.shape[-3], a.shape[-2]) < 24:
            break
        pool = lambda x: (
            x[..., : x.shape[-3] // 2 * 2, : x.shape[-2] // 2 * 2, :]
            .reshape(*x.shape[:-3], x.shape[-3] // 2, 2, x.shape[-2] // 2, 2, x.shape[-1])
            .mean(axis=(-4, -2))
        )
        a, b = pool(a), pool(b)
    return float(1.0 - np.mean(vals))
