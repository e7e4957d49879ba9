"""Regenerated weight artifacts: load and denoise sanity (skips if absent)."""

import os

import jax.numpy as jnp
import numpy as np
import pytest

FASTDVD_NPZ = "/root/repo/weights/fastdvd.npz"
DDNET_NPZ = "/root/repo/weights/ddnet.npz"


@pytest.mark.skipif(not os.path.exists(FASTDVD_NPZ), reason="weights absent")
def test_fastdvd_npz_denoises(rng):
    from adaptivepnp_sci_tpu.models.fastdvdnet import FastDVDnet
    from adaptivepnp_sci_tpu.ops import metrics
    from adaptivepnp_sci_tpu.solvers.priors import fastdvd_prior
    from adaptivepnp_sci_tpu.train.datasets import synthetic_video_dataset
    from adaptivepnp_sci_tpu.train.trainer import load_variables_npz

    v = load_variables_npz(FASTDVD_NPZ)
    prior = fastdvd_prior(FastDVDnet())
    clip = synthetic_video_dataset(1, length=8, size=32, seed=77)[0]
    sig = 25 / 255
    noisy = np.clip(clip + rng.normal(0, sig, clip.shape), 0, 1).astype(np.float32)
    out = prior.apply(v, jnp.asarray(noisy), jnp.float32(sig))
    p_in = float(metrics.psnr(jnp.asarray(clip), jnp.asarray(noisy)))
    p_out = float(metrics.psnr(jnp.asarray(clip), jnp.clip(out, 0, 1)))
    assert p_out > p_in + 5, (p_in, p_out)


@pytest.mark.skipif(not os.path.exists(DDNET_NPZ), reason="weights absent")
def test_ddnet_npz_demosaics(rng):
    from adaptivepnp_sci_tpu.models.ddnet import DDnet
    from adaptivepnp_sci_tpu.ops import bayer, metrics
    from adaptivepnp_sci_tpu.solvers.priors import ddnet_demosaic
    from adaptivepnp_sci_tpu.train.datasets import synthetic_video_dataset
    from adaptivepnp_sci_tpu.train.trainer import load_variables_npz

    v = load_variables_npz(DDNET_NPZ)
    dm = ddnet_demosaic(DDnet(), v)
    clip = synthetic_video_dataset(1, length=8, size=32, seed=78)[0]
    mosaic = np.asarray(bayer.mosaic(jnp.asarray(clip)))
    out = dm(jnp.asarray(mosaic))
    assert out.shape == clip.shape
    p = float(metrics.psnr(jnp.asarray(clip), jnp.clip(out, 0, 1)))
    assert p > 25, p
