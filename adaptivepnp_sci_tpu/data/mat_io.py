"""MATLAB ``.mat`` dataset / result I/O (host-side).

Data contract of the reference drivers
(``/root/reference/two_stage_ADMM_Online_FFD_Warm.py:164-196,316-330``):

  * input ``.mat`` v7.3 (HDF5) with keys ``meas_bayer (W, H[, T])``,
    ``mask_bayer (B, H, W)``, optional ``orig_bayer (W, H, T*B)`` and
    ``orig`` — h5py reads them transposed, drivers re-transpose to
    ``(H, W, ...)`` fp32 and scale by /255 where stored as uint;
  * warm-start ``.mat`` (v5, scipy) with key ``v_Admm_tv_denoise``
    (``ADMM_TV_Warm_Start_save.py:174-178``);
  * results ``.mat`` with reconstruction + PSNR/SSIM arrays incl. the
    per-iteration trace ``psnr_all_iter``.

Internally everything converts to this framework's layouts:
``meas (T, H, W)``, ``mask (B, H, W)``, ``orig (T, B, H, W)``.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np


@dataclass
class SceneData:
    name: str
    meas: np.ndarray        # (T, H, W) snapshots, float32 in [0, ~B]
    mask: np.ndarray        # (B, H, W) float32 binary
    orig_bayer: np.ndarray | None  # (T, B, H, W) ground truth or None
    #: raw ``orig`` key (RGB ground truth), carried verbatim into results
    #: like the driver does (``two_stage_ADMM_Online_FFD_Warm.py:169,329``)
    orig_real: np.ndarray | None = None
    #: the MAXB the measurement/GT were divided by at load time
    maxb: float = 255.0

    @property
    def n_meas(self) -> int:
        return self.meas.shape[0]

    @property
    def n_frames(self) -> int:
        return self.mask.shape[0]


def load_cacti_mat(path: str, name: str = "", maxb: float = 255.0) -> SceneData:
    """Read a CACTI scene from a ``.mat`` file (v7.3 HDF5 or v5).

    ``meas_bayer`` and ``orig_bayer`` are divided by ``maxb``
    UNCONDITIONALLY, exactly like the drivers' ``/MAXB``
    (``two_stage_ADMM_Online_FFD_Warm.py:30,245-248``) — a float-stored
    0-255 scene (max < 510) must still be scaled. Pass ``maxb=1.0`` for
    data already in [0, 1]. The mask is never scaled.
    """
    try:
        import h5py

        with h5py.File(path, "r") as f:
            raw = {k: np.asarray(f[k]) for k in f.keys() if not k.startswith("#")}
        # h5py yields MATLAB arrays transposed (column-major metadata):
        # meas_bayer (W,H) or (T,W,H); mask_bayer (B,W,H)... the reference
        # transposes spatial dims back ((H,W)): we mirror that.
        meas = raw["meas_bayer"]
        mask = raw["mask_bayer"]
        orig = raw.get("orig_bayer")
        orig_real = raw.get("orig")
        if meas.ndim == 2:
            meas = meas.T[None]                    # (1, H, W)
        else:
            meas = np.transpose(meas, (0, 2, 1))   # (T, H, W)
        mask = np.transpose(mask, (0, 2, 1))       # (B, H, W)
        if orig is not None:
            orig = np.transpose(orig, (0, 2, 1))   # (T*B, H, W)
    except (OSError, KeyError):
        import scipy.io as sio

        raw = sio.loadmat(path)
        meas = raw["meas_bayer"].astype(np.float32)
        mask = raw["mask_bayer"]
        orig = raw.get("orig_bayer")
        orig_real = raw.get("orig")
        # scipy yields MATLAB shapes directly: meas (H,W[,T]), mask (H,W,B)
        meas = meas[None] if meas.ndim == 2 else np.transpose(meas, (2, 0, 1))
        mask = np.transpose(mask, (2, 0, 1))
        if orig is not None:
            orig = np.transpose(orig, (2, 0, 1))

    meas = np.asarray(meas).astype(np.float32) / maxb
    mask = np.asarray(mask).astype(np.float32)
    b = mask.shape[0]
    if orig is not None:
        orig = np.asarray(orig).astype(np.float32) / maxb
        t = orig.shape[0] // b
        orig = orig[: t * b].reshape(t, b, *orig.shape[1:])
    return SceneData(
        name=name, meas=meas, mask=mask, orig_bayer=orig,
        orig_real=orig_real, maxb=maxb,
    )


def save_warm_start(path: str, recon: np.ndarray) -> None:
    """Write the warm-start contract: key ``v_Admm_tv_denoise`` shaped
    ``(H, W, B*T)`` like the reference (``ADMM_TV_Warm_Start_save.py:174-178``)."""
    import scipy.io as sio

    t, b, h, w = recon.shape
    flat = np.transpose(recon.reshape(t * b, h, w), (1, 2, 0))
    sio.savemat(path, {"v_Admm_tv_denoise": flat})


def load_warm_start(path: str, n_frames: int) -> np.ndarray:
    """Read ``v_Admm_tv_denoise (H, W, B*T)`` -> ``(T, B, H, W)``."""
    import scipy.io as sio

    flat = sio.loadmat(path)["v_Admm_tv_denoise"].astype(np.float32)
    h, w, tb = flat.shape
    t = tb // n_frames
    return np.transpose(flat, (2, 0, 1)).reshape(t, n_frames, h, w)


def save_results(
    path: str,
    x_bayer: np.ndarray,            # (T, B, H, W)
    x_rgb: np.ndarray | None,       # (T, B, H, W, 3)
    psnr: np.ndarray,
    ssim: np.ndarray,
    psnr_all_iter: np.ndarray,
    meta: dict | None = None,
    orig_real: np.ndarray | None = None,
    meas_bayer: np.ndarray | None = None,
) -> None:
    """Write reconstruction results with the reference's key set
    (``two_stage_ADMM_Online_FFD_Warm.py:316-330``), including the verbatim
    RGB ground truth ``orig_real`` (:329) and the unscaled measurement
    ``meas_bayer`` (:330) when provided."""
    import scipy.io as sio

    t, b, h, w = x_bayer.shape
    out = {
        "v_recon_bayer": np.transpose(x_bayer.reshape(t * b, h, w), (1, 2, 0)),
        "psnr": np.asarray(psnr),
        "ssim": np.asarray(ssim),
        "psnr_all_iter": np.asarray(psnr_all_iter),
    }
    if orig_real is not None:
        out["orig_real"] = np.asarray(orig_real)
    if meas_bayer is not None:
        out["meas_bayer"] = np.asarray(meas_bayer)
    if x_rgb is not None:
        out["v_recon_rgb"] = np.transpose(
            x_rgb.reshape(t * b, h, w, 3), (1, 2, 3, 0)
        )
    if meta:
        out.update(meta)
    sio.savemat(path, out)
