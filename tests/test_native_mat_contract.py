"""Adversarial `.mat` fixtures replaying MATLAB-origin conventions.

The previous fixtures for `load_cacti_mat` were authored by the same code
family that reads them; these replay the quirks a real PnP-SCI / MATLAB
capture file carries (`/root/reference/two_stage_ADMM_Online_FFD_Warm.py:
164-196,245-248`):

  * v7.3 (HDF5): MATLAB stores column-major, so h5py sees every array with
    its MATLAB dims REVERSED — `meas_bayer (H,W,T)` reads as `(T,W,H)` —
    plus `MATLAB_class` attrs; the drivers transpose back with `(2,1,0)`.
  * uint8-stored `orig_bayer` / `orig` (8-bit captures), double `meas`;
    both divided by MAXB=255, the mask never scaled.
  * non-square frames, so a wrong transpose cannot hide.
  * single-measurement files where `meas_bayer` is 2-D (no T axis,
    reference `if len(meas_bayer.shape) < 3` branch :243-246).
  * files without the optional `orig_bayer` / `orig` keys.
  * v7 (pre-7.3, non-HDF5) files through the scipy fallback, stored in
    MATLAB shapes `(H,W,·)` directly.

One test drives the full CLI chain `warmstart -> reconstruct -> eval`
from disk over the MATLAB-convention fixture.
"""

import numpy as np
import pytest
import scipy.io as sio

from adaptivepnp_sci_tpu.data.mat_io import load_cacti_mat

H, W, B, T = 24, 32, 4, 2  # non-square on purpose


@pytest.fixture(scope="module")
def truth():
    """Consistent CACTI physics with uint8-quantized ground truth.

    orig_u8 (T,B,H,W) uint8; mask (B,H,W) binary float; meas255 (T,H,W)
    double in measurement scale (sum over B of mask*frame, 0..255*B).
    """
    rng = np.random.default_rng(77)
    base = rng.random((T, B, H, W)).astype(np.float32)
    # smooth it a little so it looks like video, then quantize to uint8
    base = (base + np.roll(base, 1, -1) + np.roll(base, 1, -2)) / 3.0
    orig_u8 = np.round(base * 255).astype(np.uint8)
    mask = (rng.random((B, H, W)) > 0.5).astype(np.float32)
    meas255 = np.einsum("tbhw,bhw->thw", orig_u8.astype(np.float64), mask)
    return orig_u8, mask, meas255


def _write_matlab_v73(path, mask, meas255=None, orig_u8=None, orig_real=None):
    """Author an HDF5 file exactly as MATLAB `save -v7.3` lays it out:
    every MATLAB array `(d1,...,dk)` stored with reversed dims, with a
    MATLAB_class attribute."""
    import h5py

    def put(f, key, arr, mat_class):
        # arr comes in this framework's (T/B leading) layout; MATLAB keeps
        # (H,W,·): reversed-on-disk = (·,W,H), i.e. transpose spatial dims
        d = f.create_dataset(key, data=arr)
        d.attrs["MATLAB_class"] = np.bytes_(mat_class)

    with h5py.File(path, "w") as f:
        put(f, "mask_bayer", np.transpose(mask, (0, 2, 1)), b"double")
        if meas255 is not None:
            on_disk = (np.transpose(meas255, (0, 2, 1))
                       if meas255.ndim == 3 else meas255.T)
            put(f, "meas_bayer", on_disk, b"double")
        if orig_u8 is not None:
            t, b = orig_u8.shape[:2]
            flat = orig_u8.reshape(t * b, H, W)
            put(f, "orig_bayer", np.transpose(flat, (0, 2, 1)), b"uint8")
        if orig_real is not None:
            put(f, "orig", orig_real, b"uint8")


def test_v73_matlab_conventions(tmp_path, truth):
    orig_u8, mask, meas255 = truth
    orig_real = np.arange(3 * H * W, dtype=np.uint8).reshape(3, W, H)
    path = str(tmp_path / "capture_v73.mat")
    _write_matlab_v73(path, mask, meas255, orig_u8, orig_real)

    sc = load_cacti_mat(path, "capture")
    assert sc.meas.shape == (T, H, W) and sc.meas.dtype == np.float32
    assert sc.mask.shape == (B, H, W)
    assert sc.orig_bayer.shape == (T, B, H, W)
    np.testing.assert_allclose(sc.meas, meas255 / 255.0, rtol=0, atol=1e-6)
    np.testing.assert_array_equal(sc.mask, mask)
    np.testing.assert_allclose(
        sc.orig_bayer, orig_u8.astype(np.float32) / 255.0, atol=1e-7)
    # physics consistency survives the round trip: meas == A(orig)
    np.testing.assert_allclose(
        sc.meas, np.einsum("tbhw,bhw->thw", sc.orig_bayer, sc.mask),
        atol=1e-5)
    # `orig` is carried VERBATIM (reference keeps it raw, :169)
    np.testing.assert_array_equal(np.asarray(sc.orig_real), orig_real)


def test_v73_single_measurement_2d_meas(tmp_path, truth):
    orig_u8, mask, meas255 = truth
    path = str(tmp_path / "single_v73.mat")
    _write_matlab_v73(path, mask, meas255[0], orig_u8[:1])
    sc = load_cacti_mat(path, "single")
    assert sc.meas.shape == (1, H, W)
    np.testing.assert_allclose(sc.meas[0], meas255[0] / 255.0, atol=1e-6)
    assert sc.orig_bayer.shape == (1, B, H, W)


def test_v73_missing_optional_keys(tmp_path, truth):
    _, mask, meas255 = truth
    path = str(tmp_path / "nogt_v73.mat")
    _write_matlab_v73(path, mask, meas255)
    sc = load_cacti_mat(path, "nogt")
    assert sc.orig_bayer is None and sc.orig_real is None

    # the pipeline must still reconstruct (metrics zeroed, not crash)
    from adaptivepnp_sci_tpu.pipelines import run_warm_start

    out = run_warm_start(sc, iters=4)
    assert np.isfinite(np.asarray(out.x_bayer)).all()
    assert float(np.asarray(out.psnr).sum()) == 0.0


def test_v5_scipy_fallback_matlab_shapes(tmp_path, truth):
    """Pre-7.3 files: scipy sees MATLAB shapes directly — meas (H,W,T),
    mask (H,W,B), orig_bayer (H,W,T*B) uint8."""
    orig_u8, mask, meas255 = truth
    path = str(tmp_path / "capture_v5.mat")
    sio.savemat(path, {
        "meas_bayer": np.transpose(meas255, (1, 2, 0)),
        "mask_bayer": np.transpose(mask, (1, 2, 0)),
        "orig_bayer": np.transpose(
            orig_u8.reshape(T * B, H, W), (1, 2, 0)),
    })
    sc = load_cacti_mat(path, "v5")
    np.testing.assert_allclose(sc.meas, meas255 / 255.0, atol=1e-6)
    np.testing.assert_array_equal(sc.mask, mask)
    np.testing.assert_allclose(
        sc.orig_bayer, orig_u8.astype(np.float32) / 255.0, atol=1e-7)


def test_v5_2d_meas_and_missing_gt(tmp_path, truth):
    _, mask, meas255 = truth
    path = str(tmp_path / "v5_single.mat")
    sio.savemat(path, {
        "meas_bayer": meas255[0],                      # (H, W), 2-D
        "mask_bayer": np.transpose(mask, (1, 2, 0)),
    })
    sc = load_cacti_mat(path, "v5single")
    assert sc.meas.shape == (1, H, W)
    assert sc.orig_bayer is None


def test_cli_chain_over_matlab_fixture(tmp_path, truth, capsys):
    """warmstart -> reconstruct -> eval driven from disk over the
    MATLAB-convention v7.3 fixture (the reference's two-script handoff)."""
    from adaptivepnp_sci_tpu.cli import main

    orig_u8, mask, meas255 = truth
    data = str(tmp_path / "capture_v73.mat")
    _write_matlab_v73(data, mask, meas255, orig_u8)

    warm = str(tmp_path / "warm.mat")
    main(["warmstart", "--data", data, "--out", warm, "--iters", "8"])
    assert "warm start PSNR" in capsys.readouterr().out

    results = str(tmp_path / "results.mat")
    main(["reconstruct", "--data", data, "--warm", warm, "--name", "Beauty",
          "--denoiser", "ffdnet", "--random-init", "--no-update",
          "--out", results])
    capsys.readouterr()

    main(["eval", results, "--data", data])
    out = capsys.readouterr().out
    assert "recomputed" in out or "PSNR" in out
    res = sio.loadmat(results)
    assert res["v_recon_bayer"].shape == (H, W, T * B)
    assert np.isfinite(res["v_recon_bayer"]).all()
