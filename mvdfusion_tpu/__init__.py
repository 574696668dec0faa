"""mvdfusion_tpu — a TPU-native JAX/Flax/Pallas framework with the
capabilities of MVD-Fusion (CVPR 2024): single-view 3D via depth-consistent
multi-view latent diffusion.

Layering (bottom -> top):
    core      — diffusion schedules, config registry, checkpoint I/O
    geometry  — cameras / rays / grid-sampling (PyTorch3D conventions, pure JAX)
    nn        — Flax modules: VAE, CLIP image tower, UNet, cross-view attention
    ops       — Pallas TPU kernels for hot paths
    pipeline  — jitted DDIM sampler and train step
    parallel  — device mesh + sharding rules
    data      — dataset loaders (GSO / wild / Objaverse layouts)
    cli       — demo / train entry points

Reference behavior is documented against zhizdev/mvdfusion (file:line cites in
docstrings); the implementation is an independent TPU-first design.
"""

__version__ = "0.1.0"
