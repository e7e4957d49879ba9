"""Training data pipelines.

The reference trains on DAVIS sequences / image folders prepared into HDF5
patch databases (``packages/ffdnet/{prepare_patches,dataset}.py``) or decoded
on GPU with NVIDIA DALI (optional, disabled). Neither the data nor DALI ship
here, so this module provides:

  * :func:`extract_patches` — multiscale strided patch extraction matching
    the FFDNet pipeline (scales 1/0.9/0.8/0.7, ``dataset.py:24-145``);
  * :func:`temporal_chunks` — 5-frame training windows from video arrays
    (``packages/{fastdvdnet,DDnet}/dataset.py``);
  * array-backed batch iterators (optionally from ``.npy``/``.npz`` files)
    that feed the device once per step — the host side stays trivial because
    augmentation/noise run on device inside the jitted train step;
  * :func:`synthetic_video_dataset` — procedurally generated clips for tests
    and for regenerating DDnet weights without external data.
"""

from __future__ import annotations

import os
from typing import Iterator

import numpy as np

FFDNET_SCALES = (1.0, 0.9, 0.8, 0.7)


def _rescale(img: np.ndarray, scale: float) -> np.ndarray:
    """Nearest-neighbor rescale (host-side, data prep only)."""
    if scale == 1.0:
        return img
    h, w = img.shape[:2]
    nh, nw = int(h * scale), int(w * scale)
    yi = (np.arange(nh) / scale).astype(np.int32).clip(0, h - 1)
    xi = (np.arange(nw) / scale).astype(np.int32).clip(0, w - 1)
    return img[yi][:, xi]


def extract_patches(
    img: np.ndarray, patch: int, stride: int,
    scales: tuple[float, ...] = FFDNET_SCALES,
) -> np.ndarray:
    """Multiscale strided patches of one image ``(H, W, C) -> (N, p, p, C)``."""
    out = []
    for s in scales:
        im = _rescale(img, s)
        h, w = im.shape[:2]
        for y in range(0, h - patch + 1, stride):
            for x in range(0, w - patch + 1, stride):
                out.append(im[y : y + patch, x : x + patch])
    if not out:
        return np.zeros((0, patch, patch) + img.shape[2:], img.dtype)
    return np.stack(out)


def temporal_chunks(video: np.ndarray, length: int = 5, stride: int = 3) -> np.ndarray:
    """Overlapping temporal windows ``(T, H, W, C) -> (N, length, H, W, C)``."""
    t = video.shape[0]
    starts = list(range(0, max(t - length + 1, 1), stride))
    return np.stack([video[s : s + length] for s in starts if s + length <= t])


def synthetic_video_dataset(
    n_clips: int, length: int = 5, size: int = 96, seed: int = 0,
    textured: bool = False, source_sizes: tuple[int, ...] | None = None,
    crops_per_video: int = 8, styles: tuple[str, ...] | None = None,
) -> np.ndarray:
    """Procedural video clips ``(n, length, size, size, 3)`` in [0,1].

    ``textured=True`` mixes in structured content (oriented gratings, edges,
    rectangles) drifting over time — smooth blobs alone teach a denoiser
    nothing about preserving high-frequency detail.

    ``styles``: when given, each source video's scene family is drawn
    uniformly from this tuple — ``'smooth'`` (drifting blobs), ``'textured'``
    (blobs + gratings/rectangles), ``'leaves'`` (dead-leaves occlusion model,
    natural-image statistics), ``'photo'``/``'photos'`` (REAL photographs
    under camera motion — ``'photos'`` draws from all bundled photos with a
    pan+zoom+roll similarity path; see ``data/synthetic.make_scene``).
    Supersedes the legacy ``textured`` flag. A denoiser trained only on
    smooth blobs does not generalize to natural statistics (RESULTS.md
    dead-leaves row); mixing real-photo clips into the pool is the closest
    available stand-in for the reference's DAVIS natural-video training.

    ``source_sizes``: when given, each clip is a random ``size``-square crop
    of a LARGER generated video whose side is drawn from this tuple (the
    reference trains on crops of full-resolution DAVIS video the same way,
    ``packages/DDnet/utils.py:22-46``). The generator scales feature sizes
    with the frame side, so directly-generated 64-px clips carry 3-10 px
    blobs while a 512-px benchmark scene carries 25-77 px blobs — a
    denoiser fit only on small-scale statistics destabilizes the PnP loop
    at full resolution. Crops inherit the large-scene pixel statistics.
    ``crops_per_video`` crops share one generated source video (amortizes
    the generation cost).
    """
    from adaptivepnp_sci_tpu.data.synthetic import (
        _dead_leaves_video,
        _photo_video,
        _photos_video,
        _smooth_video,
        _texture_video,
    )

    known = ("smooth", "textured", "leaves", "photo", "photos")
    if styles:
        bad = [s for s in styles if s not in known]
        if bad:
            raise ValueError(f"unknown clip style(s) {bad!r}; choose from {known}")

    rng = np.random.default_rng(seed)

    def generate(s: int) -> np.ndarray:
        # styles=None preserves the legacy rng stream exactly (video drawn
        # BEFORE the textured coin flip), so the shipped-weights datasets
        # stay seed-reproducible
        style = styles[int(rng.integers(len(styles)))] if styles else None
        if style == "leaves":
            return _dead_leaves_video(length, s, s, rng)
        if style == "photo":
            return _photo_video(length, s, s, rng)
        if style == "photos":
            return _photos_video(length, s, s, rng)
        video = _smooth_video(length, s, s, rng)
        if style == "textured" or (
            style is None and textured and rng.random() < 0.5
        ):
            video = np.clip(video + _texture_video(length, s, rng), 0, 1)
        return video

    clips = []
    if source_sizes:
        while len(clips) < n_clips:
            s = int(rng.choice(source_sizes))
            video = generate(s)
            for _ in range(min(crops_per_video, n_clips - len(clips))):
                y0 = int(rng.integers(0, s - size + 1))
                x0 = int(rng.integers(0, s - size + 1))
                clips.append(video[:, y0 : y0 + size, x0 : x0 + size])
        return np.stack(clips)
    for i in range(n_clips):
        if styles:
            clips.append(generate(size))
        else:
            # legacy direct-generation path: textured on even indices
            clip = _smooth_video(length, size, size, rng)
            if textured and i % 2 == 0:
                clip = np.clip(clip + _texture_video(length, size, rng), 0, 1)
            clips.append(clip)
    return np.stack(clips)


def load_array_dir(path: str) -> list[np.ndarray]:
    """Load all ``.npy``/``.npz`` arrays under a directory (videos or images).

    ``.npy`` files stream through the native C++ prefetch ring when built
    (``data/native_loader.py``), overlapping disk reads."""
    names = sorted(os.listdir(path))
    npys = [os.path.join(path, n) for n in names if n.endswith(".npy")]
    arrays: list[np.ndarray] = []
    if npys:
        from adaptivepnp_sci_tpu.data.native_loader import iter_npy_prefetched

        arrays.extend(iter_npy_prefetched(npys))
    for name in names:
        if name.endswith(".npz"):
            with np.load(os.path.join(path, name)) as z:
                arrays.extend(z[k] for k in z.files)
    return arrays


def write_patch_db(path: str, patches: np.ndarray, chunk: int = 256) -> None:
    """Persist a patch set as an HDF5 database (the FFDNet pipeline's
    ``prepare_patches`` artifact, ``packages/ffdnet/dataset.py:24-145``)."""
    import h5py

    with h5py.File(path, "w") as f:
        f.create_dataset(
            "patches", data=patches,
            chunks=(min(chunk, len(patches)),) + patches.shape[1:],
        )


def read_patch_db(path: str) -> np.ndarray:
    import h5py

    with h5py.File(path, "r") as f:
        return np.asarray(f["patches"])


def batch_iterator(
    data: np.ndarray, batch_size: int, seed: int = 0, epochs: int | None = None
) -> Iterator[np.ndarray]:
    """Shuffled epoch iterator over the leading axis."""
    rng = np.random.default_rng(seed)
    epoch = 0
    while epochs is None or epoch < epochs:
        order = rng.permutation(len(data))
        for i in range(0, len(data) - batch_size + 1, batch_size):
            yield data[order[i : i + batch_size]]
        epoch += 1


def paired_batch_iterator(
    arrays: tuple, batch_size: int, seed: int = 0,
    epochs: int | None = None,
) -> Iterator[tuple]:
    """Shuffled epoch iterator over several same-length arrays at once
    (e.g. ``(clips, sigmas, flags)``) — one shared permutation per epoch,
    yielding tuples the Trainer passes through as a pytree batch."""
    n = len(arrays[0])
    if not all(len(a) == n for a in arrays):
        raise ValueError(
            f"misaligned array lengths: {[len(a) for a in arrays]}")
    rng = np.random.default_rng(seed)
    epoch = 0
    while epochs is None or epoch < epochs:
        order = rng.permutation(n)
        for i in range(0, n - batch_size + 1, batch_size):
            sel = order[i : i + batch_size]
            yield tuple(a[sel] for a in arrays)
        epoch += 1
