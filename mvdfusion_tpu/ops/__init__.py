"""TPU ops: image resamplers + Pallas kernels for the hot paths.

  * image.py      — area/nearest/bicubic resamplers as MXU/VPU-friendly ops
  * attention.py  — fused VMEM-resident softmax attention (UNet/VAE sites)
  * crossview.py  — the fused GridAttn gather+projection+DiT+pool kernel
"""

from mvdfusion_tpu.ops.attention import fused_attention, should_fuse
from mvdfusion_tpu.ops.crossview import (
    AggregatorWeights,
    crossview_aggregate,
    should_fuse_crossview,
)
from mvdfusion_tpu.ops.image import area_downsample, bicubic_resize, nearest_upsample2x
