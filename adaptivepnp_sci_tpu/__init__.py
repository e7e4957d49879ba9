"""TPU-native Adaptive Plug-and-Play video Snapshot Compressive Imaging engine.

A brand-new JAX/XLA/Pallas framework with the capabilities of
AdaptivePnP_SCI (Wu, Yang, Su & Yuan, "Adaptive Deep PnP Algorithm for
Video Snapshot Compressive Imaging", IJCV 2023): color Bayer video is
reconstructed from single-snapshot coded measurements with a two-stage
plug-and-play ADMM whose deep denoiser priors (FFDNet, FastDVDnet, DDnet)
are fine-tuned online, per scene, against the measurement itself.

Design (TPU-first, not a port):
  * solver state lives as pytrees in packed ``(B, 4, H/2, W/2)`` layout
    (frames x Bayer planes leading, spatial dims last => clean (8, 128)
    tiling for the VPU and Pallas kernels);
  * one canonical implementation of each op (the reference carries three
    copies of A/At and two FFDNet/DDnet definitions);
  * the ADMM iteration + demosaic + denoise + online-adaptation step is a
    single jitted ``lax.scan`` per sigma stage;
  * on-device TV prox / PSNR / SSIM (the reference round-trips to the CPU
    every iteration for skimage's Cython TV kernel);
  * scaling via ``jax.sharding.Mesh`` axes ``('data', 'frame')`` with XLA
    collectives instead of ``nn.DataParallel``.
"""

__version__ = "0.1.0"

from adaptivepnp_sci_tpu.ops import physics, bayer  # noqa: F401
