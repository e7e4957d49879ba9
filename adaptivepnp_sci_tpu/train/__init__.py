"""Offline denoiser training subsystem (FFDNet / FastDVDnet / DDnet).

Reference semantics (SURVEY §2.5): Adam with milestone LR drops, MSE/2
losses, 8-mode flip/rot augmentation, SVD orthogonalization regularization,
checkpoint/resume, periodic validation — rebuilt on optax + orbax with
data-parallel steps over the device mesh instead of ``nn.DataParallel``.
"""

from adaptivepnp_sci_tpu.train.trainer import Trainer, TrainerConfig  # noqa: F401
