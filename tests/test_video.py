"""First-party video ingestion (the reference's DALI contract via cv2).

Fixture videos are MJPG .avi written by cv2 itself — the one codec path
available without an ffmpeg binary in this environment.
"""

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from adaptivepnp_sci_tpu.data.video import (
    list_videos,
    read_video,
    video_clip_dataset,
)


def _write_video(path, frames_u8):
    h, w = frames_u8.shape[1:3]
    wr = cv2.VideoWriter(str(path), cv2.VideoWriter_fourcc(*"MJPG"), 10,
                         (w, h))
    assert wr.isOpened()
    for f in frames_u8:
        wr.write(f[..., ::-1])  # RGB -> BGR
    wr.release()


@pytest.fixture(scope="module")
def video_dir(tmp_path_factory):
    root = tmp_path_factory.mktemp("videos")
    rng = np.random.default_rng(5)
    # two decodable videos of different lengths/sizes + one too-short file
    for name, t, h, w in (("a.avi", 12, 64, 80), ("b.avi", 7, 96, 96),
                          ("short.avi", 2, 64, 64)):
        # smooth content so MJPG compression error stays small
        base = rng.random((1, h, w, 3))
        ramp = np.linspace(0, 0.5, t)[:, None, None, None]
        frames = np.clip(base + ramp, 0, 1)
        _write_video(root / name, (frames * 255).astype(np.uint8))
    (root / "notavideo.txt").write_text("x")
    return str(root)


def test_read_video_roundtrip(video_dir, tmp_path):
    # constant-color frames survive MJPG with small error, RGB order kept
    path = str(tmp_path / "solid.avi")
    frames = np.zeros((6, 64, 64, 3), np.uint8)
    frames[..., 0] = 200  # red
    _write_video(path, frames)
    v = read_video(path)
    assert v.shape == (6, 64, 64, 3) and v.dtype == np.float32
    assert abs(float(v[..., 0].mean()) - 200 / 255) < 0.05
    assert float(v[..., 2].mean()) < 0.1  # not channel-swapped


def test_read_video_uint8_and_meta(video_dir, tmp_path):
    """uint8 staging keeps raw bytes (the clip-pool path); video_meta reads
    container props without decoding."""
    from adaptivepnp_sci_tpu.data.video import video_meta

    path = str(tmp_path / "solid.avi")
    frames = np.full((6, 64, 80, 3), 120, np.uint8)
    _write_video(path, frames)
    v8 = read_video(path, dtype=np.uint8)
    assert v8.dtype == np.uint8 and v8.shape == (6, 64, 80, 3)
    np.testing.assert_allclose(
        read_video(path), v8.astype(np.float32) / 255.0)
    assert video_meta(path) == (6, 64, 80)


def test_list_videos_filters_and_sorts(video_dir):
    names = [p.rsplit("/", 1)[1] for p in list_videos(video_dir)]
    assert names == ["a.avi", "b.avi", "short.avi"]


def test_clip_dataset_dali_contract(video_dir):
    clips = video_clip_dataset(video_dir, n_clips=16, length=5, size=48,
                               seed=3)
    assert clips.shape == (16, 5, 48, 48, 3)
    assert clips.dtype == np.float32
    assert 0.0 <= clips.min() and clips.max() <= 1.0
    # clips are temporally coherent (consecutive frames of a smooth ramp):
    # within-clip frame deltas are small and monotone-ish, not shuffled
    d = np.abs(np.diff(clips, axis=1)).mean()
    assert d < 0.2
    # deterministic per seed
    again = video_clip_dataset(video_dir, n_clips=16, length=5, size=48,
                               seed=3)
    np.testing.assert_array_equal(clips, again)
    assert not np.array_equal(
        clips, video_clip_dataset(video_dir, 16, length=5, size=48, seed=4))


def test_clip_dataset_skips_undersized_sources(video_dir):
    # size=90 excludes a.avi (64x80) and short.avi (2 frames): only b.avi
    clips = video_clip_dataset(video_dir, n_clips=4, length=5, size=90,
                               seed=0)
    assert clips.shape == (4, 5, 90, 90, 3)
    with pytest.raises(ValueError, match="admits"):
        video_clip_dataset(video_dir, 4, length=50, size=48)


def test_clips_train_a_step(video_dir):
    """The pool feeds the real trainer task (one fastdvd step, tiny model)."""
    import jax
    import jax.numpy as jnp

    from adaptivepnp_sci_tpu.models.fastdvdnet import FastDVDnet
    from adaptivepnp_sci_tpu.train import Trainer, TrainerConfig
    from adaptivepnp_sci_tpu.train.datasets import batch_iterator
    from adaptivepnp_sci_tpu.train.tasks import fastdvd_task

    clips = jnp.asarray(video_clip_dataset(video_dir, 8, length=5, size=32,
                                           seed=1))
    model = FastDVDnet()
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 5, 32, 32, 3)), jnp.float32(0.1))
    trainer = Trainer(fastdvd_task(model), variables,
                      TrainerConfig(lr=1e-3, steps_per_epoch=2, seed=0))
    losses = trainer.fit(batch_iterator(clips, 4, seed=0), max_steps=2)
    assert np.isfinite(losses).all()


def test_write_video_roundtrip(tmp_path):
    """write_video (the im2videos.py role) -> read_video round trip."""
    from adaptivepnp_sci_tpu.data.video import read_video, write_video

    # smooth low-frequency content: JPEG-family codecs destroy full-res
    # noise (measured 0.16 mean error), so a gradient scene bounds the
    # round trip meaningfully
    yy, xx = np.mgrid[0:48, 0:64].astype(np.float32)
    base = np.stack([yy / 48, xx / 64, (yy + xx) / 112], -1)[None]
    frames = np.clip(base * 0.7 +
                     np.linspace(0, 0.3, 6)[:, None, None, None], 0, 1
                     ).astype(np.float32)
    path = str(tmp_path / "clip.avi")
    write_video(path, frames, fps=10)
    back = read_video(path)
    assert back.shape == frames.shape
    assert float(np.abs(back - frames).mean()) < 0.06  # MJPG lossy bound
