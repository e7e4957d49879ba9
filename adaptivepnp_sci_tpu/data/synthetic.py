"""Synthetic CACTI Bayer scenes for tests and benchmarks.

The reference benchmark data (6 mid-scale 512x512x8 scenes from PnP-SCI) is
not shipped with either repository, so tests and benchmarks synthesize scenes
with the exact acquisition model of the drivers
(``/root/reference/two_stage_ADMM_Online_FFD_Warm.py:164-196``): an RGB video
cube is CFA-mosaicked per frame, modulated by per-frame binary masks, and
collapsed into one snapshot per group of B frames.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np


@dataclass
class Scene:
    """One CACTI measurement group.

    Attributes:
      meas:       snapshot measurement(s) ``(H, W)`` or ``(H, W, T)``.
      mask:       binary Bayer-domain masks ``(B, H, W)``.
      orig_bayer: ground-truth mosaicked frames ``(B, H, W)`` (or ``(T, B, H, W)``).
      orig_rgb:   ground-truth RGB frames ``(B, H, W, 3)``.
    """

    meas: np.ndarray
    mask: np.ndarray
    orig_bayer: np.ndarray
    orig_rgb: np.ndarray


def _smooth_video(b: int, h: int, w: int, rng: np.random.Generator) -> np.ndarray:
    """Piecewise-smooth moving scene in [0,1]: drifting gaussian blobs +
    gradients, so TV/denoiser priors have structure to exploit."""
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    yy, xx = yy / h, xx / w
    video = np.zeros((b, h, w, 3), np.float32)
    n_blobs = 6
    centers = rng.random((n_blobs, 2)).astype(np.float32)
    vels = (rng.random((n_blobs, 2)).astype(np.float32) - 0.5) * 0.06
    colors = rng.random((n_blobs, 3)).astype(np.float32)
    widths = (0.05 + 0.15 * rng.random(n_blobs)).astype(np.float32)
    base = np.stack([0.25 + 0.5 * xx, 0.25 + 0.5 * yy, 0.5 * (xx + yy)], -1)
    for t in range(b):
        frame = base.copy()
        for i in range(n_blobs):
            cy, cx = centers[i] + t * vels[i]
            g = np.exp(-(((yy - cy) ** 2 + (xx - cx) ** 2) / (2 * widths[i] ** 2)))
            frame += g[..., None] * (colors[i] - 0.5)
        video[t] = frame
    lo, hi = video.min(), video.max()
    return (video - lo) / max(hi - lo, 1e-6)


def _texture_video(length: int, h: int, rng: np.random.Generator,
                   w: int | None = None) -> np.ndarray:
    """Drifting oriented gratings + hard-edged rectangles, zero-mean-ish."""
    w = h if w is None else w
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    yy, xx = yy / h, xx / w
    out = np.zeros((length, h, w, 3), np.float32)
    # gratings
    for _ in range(rng.integers(1, 4)):
        theta = rng.uniform(0, np.pi)
        freq = rng.uniform(4, 24)
        phase_v = rng.uniform(-0.5, 0.5)
        amp = rng.uniform(0.05, 0.25)
        color = rng.uniform(0.5, 1.0, 3).astype(np.float32)
        base = freq * (np.cos(theta) * xx + np.sin(theta) * yy)
        for t in range(length):
            g = amp * np.sin(2 * np.pi * (base + phase_v * t))
            out[t] += g[..., None] * color
    # rectangles with hard edges
    for _ in range(rng.integers(1, 4)):
        h0 = rng.integers(0, h // 2)
        w0 = rng.integers(0, w // 2)
        hh = rng.integers(h // 8, h // 2)
        ww = rng.integers(w // 8, w // 2)
        vy, vx = rng.integers(-2, 3, 2)
        amp = rng.uniform(-0.3, 0.3, 3).astype(np.float32)
        for t in range(length):
            y0 = int(np.clip(h0 + vy * t, 0, h - 2))
            x0 = int(np.clip(w0 + vx * t, 0, w - 2))
            out[t, y0 : y0 + hh, x0 : x0 + ww] += amp
    return out


def make_scene(
    b: int = 8,
    h: int = 512,
    w: int = 512,
    seed: int = 42,
    n_meas: int = 1,
    textured: bool = False,
) -> Scene:
    """Synthesize ``n_meas`` CACTI snapshots of a B-frame RGB video.

    ``textured=True`` overlays drifting oriented gratings and hard-edged
    rectangles on the smooth blob scene — a harder regime (high-frequency
    content the priors must preserve) that lands in realistic dB ranges,
    closer to the reference's real mid-scale scenes than the smooth default.
    """
    rng = np.random.default_rng(seed)
    mask = (rng.random((b, h, w)) > 0.5).astype(np.float32)

    from adaptivepnp_sci_tpu.ops.bayer import cfa_masks

    cfa = cfa_masks((h, w)).astype(np.float32)

    metas, origs_b, origs_rgb = [], [], []
    for i in range(n_meas):
        rgb = _smooth_video(b, h, w, rng)
        if textured:
            rgb = np.clip(rgb + _texture_video(b, h, rng, w), 0.0, 1.0)
        bayer = (rgb * cfa).sum(-1)  # (B, H, W)
        metas.append((bayer * mask).sum(0))  # (H, W)
        origs_b.append(bayer)
        origs_rgb.append(rgb)

    if n_meas == 1:
        return Scene(metas[0], mask, origs_b[0], origs_rgb[0])
    return Scene(
        np.stack(metas, -1), mask, np.stack(origs_b), np.stack(origs_rgb)
    )
