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


def cross_view_consistency(
    rgb: np.ndarray,
    depth_stored: np.ndarray,
    R: np.ndarray,
    T: np.ndarray,
    f: np.ndarray,
    c: np.ndarray = None,
    depth_scale: float = 2.0,
    depth_shift: float = 0.5,
    tau: float = 0.1,
    bg_threshold: float = 0.98,
) -> dict:
    """Quantify the paper's headline claim — depth-consistent multi-view
    generation (reference README.md:11-12; the mechanism being measured is
    view_attn_efficient2.py:413-442) — on a set of generated RGB-D views.

    For every ordered view pair (i, j): unproject view i's pixels at view
    i's own predicted depth (the exact chain GridAttn uses: pixel_rays ->
    rays_to_points -> transform_points_ndc -> negated-xy grid_sample), land
    them in view j, classify each landing by the signed gap between the
    point's view-j z and view j's OWN predicted depth sampled there:

      * occluded  (sampled z < z_reproj - tau): j sees a nearer surface —
        legitimate with 360-degree rigs, EXCLUDED from the scores;
      * agreeing  (|gap| <= tau): both views describe one surface here;
      * violating (sampled z > z_reproj + tau): j sees THROUGH the surface
        i claims — a genuine depth inconsistency.

    and score photometric agreement (view i's RGB vs view j's RGB sampled
    at the reprojection) over the agreeing set. Photometric MAE is the
    headline: wrong geometry mis-registers colors (a self-consistent but
    wrong depth — e.g. a flat plane — passes the depth gate yet lights up
    photometrically), and view-inconsistent RGB fails it directly.

    Inputs are all at the same (latent) resolution: rgb (B, h, w, 3) in
    [0,1] (callers area-downsample decoded RGB), depth_stored (B, h, w, 1)
    in the stored [0,1] convention with metric z = stored*scale + shift
    (view_attn_efficient2.py:432 via data/synthetic.py). Source pixels are
    restricted to eroded foreground (stored depth < bg_threshold, 1px
    4-neighborhood erosion): background agrees trivially, and silhouette
    pixels mix fg/bg depth under bilinear sampling at latent resolution.

    Returns {photo_mae, depth_agree_rate, covis_frac, n_pairs}:
    photo_mae over agreeing pixels; depth_agree_rate = agree/(agree+viol);
    covis_frac = agree/(agree+viol+occluded) (a collapse indicator). At
    latent resolution the analytic ground-truth ceiling is itself below
    1.0 (bilinear depth across curved surfaces); compare AGAINST the GT
    ceiling on the same scenes, not against 1.0.
    """
    import jax.numpy as jnp

    from mvdfusion_tpu.geometry import (
        grid_sample, make_cameras, pixel_rays, transform_points_ndc,
    )

    rgb = np.asarray(rgb, np.float32)
    depth_stored = np.asarray(depth_stored, np.float32)
    B, h, w, _ = rgb.shape
    cams = make_cameras(jnp.asarray(R), jnp.asarray(T), jnp.asarray(f),
                        None if c is None else jnp.asarray(c))
    rays = pixel_rays(cams, h, w)
    z_metric = depth_stored[..., 0] * depth_scale + depth_shift  # (B,h,w)
    pts = np.asarray(rays.origins) + np.asarray(rays.directions) * z_metric[..., None]
    pts = pts.reshape(B, h * w, 3)
    fg2 = depth_stored[..., 0] < bg_threshold
    pad = np.pad(fg2, ((0, 0), (1, 1), (1, 1)), constant_values=False)
    fg2 = fg2 & pad[:, :-2, 1:-1] & pad[:, 2:, 1:-1] & pad[:, 1:-1, :-2] & pad[:, 1:-1, 2:]
    fg = fg2.reshape(B, -1)
    rgb_flat = rgb.reshape(B, -1, 3)
    jrgb = jnp.asarray(rgb)
    jdep = jnp.asarray(depth_stored)

    photo_n = agree_n = viol_n = occl_n = 0.0
    for i in range(B):
        # shared-points broadcast: i's cloud projected into ALL cameras
        ndc = np.asarray(transform_points_ndc(cams, jnp.asarray(pts[i : i + 1])))
        xy = ndc[..., :2]  # (B, N, 2)
        zj = 1.0 / ndc[..., 2]  # view-space z of i's points in each view
        samp_rgb = np.asarray(grid_sample(jrgb, jnp.asarray(-xy)))  # (B, N, 3)
        samp_dep = (
            np.asarray(grid_sample(jdep, jnp.asarray(-xy)))[..., 0] * depth_scale
            + depth_shift
        )
        inb = (
            (np.abs(xy[..., 0]) < 1.0 - 2.0 / w)
            & (np.abs(xy[..., 1]) < 1.0 - 2.0 / h)
            & (zj > 0.0)
        )
        valid = inb & fg[i][None, :]
        valid[i] = False  # self-pair excluded
        gap = samp_dep - zj
        agree = valid & (np.abs(gap) <= tau)
        viol = valid & (gap > tau)
        occl = valid & (gap < -tau)
        pe = np.abs(samp_rgb - rgb_flat[i][None]).mean(-1)
        photo_n += float((pe * agree).sum())
        agree_n += float(agree.sum())
        viol_n += float(viol.sum())
        occl_n += float(occl.sum())

    eps = 1e-9
    return dict(
        photo_mae=photo_n / max(agree_n, eps),
        depth_agree_rate=agree_n / max(agree_n + viol_n, eps),
        covis_frac=agree_n / max(agree_n + viol_n + occl_n, eps),
        n_pairs=B * (B - 1),
    )


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
