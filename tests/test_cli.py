"""CLI workflow tests (tiny shapes, random weights, CPU)."""

import os

import numpy as np
import pytest
import scipy.io as sio

from adaptivepnp_sci_tpu.cli import main

FFD_CKPT = "/root/reference/model_zoo/ffdnet_color.pth"


@pytest.fixture
def scene_mat(tmp_path):
    path = str(tmp_path / "scene.mat")
    main(["synth", "--out", path, "--size", "32", "--frames", "4", "--seed", "3"])
    return path


def test_cli_synth_shapes(scene_mat):
    raw = sio.loadmat(scene_mat)
    assert raw["meas_bayer"].shape == (32, 32, 1)
    assert raw["mask_bayer"].shape == (32, 32, 4)
    assert raw["orig_bayer"].shape == (32, 32, 4)


def test_cli_warmstart_and_reconstruct(tmp_path, scene_mat, capsys):
    warm = str(tmp_path / "warm.mat")
    main(["warmstart", "--data", scene_mat, "--out", warm, "--iters", "10"])
    out = capsys.readouterr().out
    assert "warm start PSNR" in out

    results = str(tmp_path / "results.mat")
    args = [
        "reconstruct", "--data", scene_mat, "--warm", warm,
        "--name", "Beauty", "--denoiser", "ffdnet",
        "--out", results, "--no-update",
    ]
    if os.path.exists(FFD_CKPT):
        args += ["--ckpt", FFD_CKPT]
    else:
        args += ["--random-init"]  # untrained weights are opt-in only
    main(args)
    out = capsys.readouterr().out
    assert "PSNR" in out
    saved = sio.loadmat(results)
    assert saved["v_recon_bayer"].shape == (32, 32, 4)
    assert np.isfinite(saved["v_recon_bayer"]).all()
    assert saved["psnr"].shape == (1, 4)


def test_cli_serve_processes_backlog(tmp_path, capsys):
    """`serve --once` must drain the watch directory: reconstruct every
    stable .mat (online adaptation ON, weights carried across files),
    write same-named results, report ground-truth-less files as 'PSNR n/a'
    instead of a fake 0.00 dB, and survive unreadable files."""
    watch = tmp_path / "in"
    outd = tmp_path / "out"
    watch.mkdir()
    main(["synth", "--out", str(watch / "a.mat"), "--size", "32",
          "--frames", "4", "--seed", "1"])
    main(["synth", "--out", str(watch / "b.mat"), "--size", "32",
          "--frames", "4", "--seed", "2", "--style", "leaves"])
    (watch / "bad.mat").write_bytes(b"not a mat file")
    # a measurement-only file (no ground truth), like a real capture
    raw = sio.loadmat(str(watch / "a.mat"))
    sio.savemat(str(watch / "blind.mat"),
                {"meas_bayer": raw["meas_bayer"],
                 "mask_bayer": raw["mask_bayer"]})

    args = ["serve", "--watch", str(watch), "--out", str(outd),
            "--denoiser", "ffdnet", "--once", "--poll", "0.1",
            "--carry-weights"]
    if os.path.exists(FFD_CKPT):
        args += ["--ckpt", FFD_CKPT]
    else:
        args += ["--random-init"]
    main(args)
    out = capsys.readouterr().out
    assert "a.mat" in out and "b.mat" in out
    assert "bad.mat FAILED" in out
    assert "blind.mat" in out and "PSNR n/a" in out
    assert sorted(os.listdir(outd)) == ["a.mat", "b.mat", "blind.mat"]
    for f in ("a.mat", "b.mat", "blind.mat"):
        saved = sio.loadmat(str(outd / f))
        assert saved["v_recon_bayer"].shape == (32, 32, 4)
        assert np.isfinite(saved["v_recon_bayer"]).all()


def test_cli_serve_reprocesses_recreated_files(tmp_path, capsys):
    """A deleted-then-recreated filename is a NEW file: the seen/sizes
    pruning forgets names that leave the directory, so a rotating producer
    can reuse names (and the service's memory stays bounded)."""
    watch = tmp_path / "in"
    outd = tmp_path / "out"
    watch.mkdir()
    main(["synth", "--out", str(watch / "a.mat"), "--size", "32",
          "--frames", "4", "--seed", "1"])
    base = ["serve", "--watch", str(watch), "--out", str(outd),
            "--denoiser", "ffdnet", "--once", "--poll", "0.1", "--no-update"]
    base += (["--ckpt", FFD_CKPT] if os.path.exists(FFD_CKPT)
             else ["--random-init"])
    main(base)
    assert "a.mat ->" in capsys.readouterr().out
    (watch / "a.mat").unlink()
    main(["synth", "--out", str(watch / "a.mat"), "--size", "32",
          "--frames", "4", "--seed", "9"])
    main(base)
    assert "a.mat ->" in capsys.readouterr().out  # processed again


def test_cli_reconstruct_tiled(tmp_path, scene_mat, capsys):
    """--tile routes through the large-scene tiled solver with the warm
    start cropped per tile (adaptation on, Beauty config)."""
    results = str(tmp_path / "tiled.mat")
    args = ["reconstruct", "--data", scene_mat, "--name", "Beauty",
            "--denoiser", "ffdnet", "--out", results, "--tile", "16"]
    if os.path.exists(FFD_CKPT):
        args += ["--ckpt", FFD_CKPT]
    else:
        args += ["--random-init"]
    main(args)
    out = capsys.readouterr().out
    assert "PSNR" in out
    saved = sio.loadmat(results)
    assert saved["v_recon_bayer"].shape == (32, 32, 4)
    assert np.isfinite(saved["v_recon_bayer"]).all()
    if os.path.exists(FFD_CKPT):
        # warm-started tiles must be far above the ~8-9 dB cold-start regime
        assert saved["psnr"].mean() > 20.0


@pytest.mark.skipif(not os.path.exists(FFD_CKPT), reason="reference ckpt absent")
def test_cli_reconstruct_resolves_default_ckpt_and_warm_start(
    tmp_path, scene_mat, capsys
):
    """No --ckpt and no --warm: the CLI must resolve the model_zoo default
    checkpoint and compute the GAP-TV warm start inline — NOT silently run a
    random-init denoiser from adjoint init (which reconstructs ~6 dB
    garbage; regression test for the round-3 CLI fix)."""
    results = str(tmp_path / "results.mat")
    main(["reconstruct", "--data", scene_mat, "--name", "Beauty",
          "--denoiser", "ffdnet", "--out", results, "--no-update"])
    capsys.readouterr()
    saved = sio.loadmat(results)
    # trained weights + warm start land far above the garbage regime even
    # on a 32px synthetic scene
    assert saved["psnr"].mean() > 20.0


def test_cli_eval_reports_and_recomputes(tmp_path, scene_mat, capsys):
    """`cli eval` prints the stored summary and recomputes PSNR from the
    stored reconstruction against --data ground truth (and warns when the
    stored numbers don't match the supplied ground truth)."""
    warm = str(tmp_path / "warm.mat")
    main(["warmstart", "--data", scene_mat, "--out", warm, "--iters", "10"])
    results = str(tmp_path / "results.mat")
    args = [
        "reconstruct", "--data", scene_mat, "--warm", warm,
        "--name", "Beauty", "--denoiser", "ffdnet",
        "--out", results, "--no-update",
    ]
    args += ["--ckpt", FFD_CKPT] if os.path.exists(FFD_CKPT) \
        else ["--random-init"]
    main(args)
    capsys.readouterr()

    main(["eval", results, "--data", scene_mat])
    out = capsys.readouterr().out
    assert "mean:   PSNR" in out
    assert "recomputed vs ground truth" in out
    # the recomputed number agrees with the stored one (same ground truth)
    assert "WARNING" not in out

    # no --data: falls back to the orig_real key stored in the results
    main(["eval", results])
    out = capsys.readouterr().out
    assert "recomputed vs ground truth" in out


def test_orig_real_layout_normalizer():
    """_orig_real_to_tbhwc recognizes all three provenance layouts that the
    verbatim-carried orig key can arrive in (and rejects garbage)."""
    from adaptivepnp_sci_tpu.cli import _orig_real_to_tbhwc

    t, b, h, w = 2, 4, 8, 6
    ref = np.random.default_rng(0).random((t, b, h, w, 3)).astype(np.float32)

    assert _orig_real_to_tbhwc(ref, t, h, w) is ref  # already (T,B,H,W,3)

    v5 = np.transpose(ref.reshape(t * b, h, w, 3), (1, 2, 3, 0))  # (H,W,3,TB)
    np.testing.assert_array_equal(_orig_real_to_tbhwc(v5, t, h, w), ref)

    v73 = np.transpose(ref.reshape(t * b, h, w, 3), (0, 3, 2, 1))  # (TB,3,W,H)
    np.testing.assert_array_equal(_orig_real_to_tbhwc(v73, t, h, w), ref)

    assert _orig_real_to_tbhwc(np.zeros((h, w, 4, t * b)), t, h, w) is None
    assert _orig_real_to_tbhwc(v5, 3, h, w) is None  # TB not divisible by T


def test_cli_denoise_ddnet_joint(tmp_path, capsys):
    """`denoise --network ddnet` = the reference's joint mosaicked-sequence
    eval (packages/DDnet/joint_test_fastdvdnet.py): mosaic the noisy frames,
    joint demosaick+denoise, min-max normalize, PSNR vs clean."""
    import jax
    import jax.numpy as jnp

    from adaptivepnp_sci_tpu.models.ddnet import DDnet
    from adaptivepnp_sci_tpu.train.trainer import save_variables_npz

    model = DDnet()
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 5, 16, 16, 3)))
    ckpt = str(tmp_path / "ddnet_rand.npz")
    save_variables_npz(ckpt, variables)

    # size 30: exercises the reflect-pad-to-/4 path (H,W % 4 != 0)
    main(["denoise", "--network", "ddnet", "--ckpt", ckpt,
          "--sigma", "1.0", "--size", "30", "--seed", "1"])
    out = capsys.readouterr().out
    assert "denoised" in out


@pytest.mark.skipif(
    not os.path.exists("/root/reference/model_zoo/ffdnet_gray.pth"),
    reason="reference gray checkpoint unavailable",
)
def test_cli_denoise_ffdnet_gray(capsys):
    """`denoise --gray` = the reference test scripts' grayscale mode."""
    main(["denoise", "--network", "ffdnet", "--gray", "--ckpt",
          "/root/reference/model_zoo/ffdnet_gray.pth",
          "--sigma", "25", "--size", "32", "--seed", "2"])
    out = capsys.readouterr().out
    assert "denoised" in out
    denoised = float(out.split("denoised")[1].split("dB")[0])
    noisy = float(out.split("noisy")[1].split("dB")[0])
    assert denoised > noisy + 3  # the real gray weights actually denoise


@pytest.mark.slow
def test_cli_serve_stress_mixed_shapes_and_corrupt_files(tmp_path, capsys):
    """Serve-daemon stress (VERDICT r3 item 8): >=20 files of MIXED shapes
    interleaved with corrupt/truncated/zero-byte/wrong-key/odd-dim .mat
    files. The service must (a) never die, (b) reconstruct every good file
    with the RIGHT per-file shape — a stale compiled program reused across
    a shape change would either crash or emit the wrong shape — and (c)
    report every bad file as FAILED."""
    import h5py

    watch = tmp_path / "in"
    outd = tmp_path / "out"
    watch.mkdir()

    # -- 16 good files over 5 distinct (H, W, B) shapes ---------------------
    good = {}  # fname -> (h, w, frames)
    shapes = [(16, 4), (32, 4), (32, 8), (16, 8)]
    i = 0
    for rep in range(3):
        for size, frames in shapes:
            name = f"g{i:02d}.mat"
            main(["synth", "--out", str(watch / name), "--size", str(size),
                  "--frames", str(frames), "--seed", str(10 + i)])
            good[name] = (size, size, frames)
            i += 1
    # non-square v5 files in MATLAB shapes (H=24, W=32)
    rng = np.random.default_rng(0)
    for frames in (4, 8):
        name = f"g{i:02d}.mat"
        orig = (rng.random((24, 32, frames)) > 0.5).astype(np.float32)
        mask = (rng.random((24, 32, frames)) > 0.5).astype(np.float32)
        sio.savemat(str(watch / name), {
            "meas_bayer": (orig * mask).sum(-1),
            "mask_bayer": mask,
            "orig_bayer": orig,
        })
        good[name] = (24, 32, frames)
        i += 1

    # -- 6 corrupt files interleaved lexicographically mid-stream -----------
    (watch / "g05a_garbage.mat").write_bytes(b"\x00\x01 not a mat at all")
    (watch / "g09a_empty.mat").write_bytes(b"")
    with h5py.File(str(watch / "g11a_tmp.h5"), "w") as f:
        f.create_dataset("meas_bayer", data=np.zeros((32, 32)))
        f.create_dataset("mask_bayer", data=np.zeros((4, 32, 32)))
    blob = (watch / "g11a_tmp.h5").read_bytes()
    (watch / "g11a_truncated.mat").write_bytes(blob[: len(blob) // 2])
    (watch / "g11a_tmp.h5").unlink()
    sio.savemat(str(watch / "g13a_missingkey.mat"),
                {"meas_bayer": np.zeros((32, 32), np.float32)})
    sio.savemat(str(watch / "g15a_odddims.mat"), {
        "meas_bayer": np.zeros((17, 17), np.float32),
        "mask_bayer": np.zeros((17, 17, 4), np.float32),
    })
    sio.savemat(str(watch / "g16a_wrongrank.mat"), {
        "meas_bayer": np.zeros((4, 4, 2, 2), np.float32),
        "mask_bayer": np.zeros((4, 4, 2), np.float32),
    })
    bad = [f for f in os.listdir(watch) if "a_" in f]
    assert len(good) + len(bad) >= 20

    args = ["serve", "--watch", str(watch), "--out", str(outd),
            "--denoiser", "ffdnet", "--once", "--poll", "0.05",
            "--no-update"]
    args += (["--ckpt", FFD_CKPT] if os.path.exists(FFD_CKPT)
             else ["--random-init"])
    main(args)  # any unhandled exception = the service died = test failure
    out = capsys.readouterr().out

    for f in bad:
        assert f"{f} FAILED" in out, f
        assert not (outd / f).exists()
    assert sorted(os.listdir(outd)) == sorted(good)
    for f, (h, w, frames) in good.items():
        saved = sio.loadmat(str(outd / f))
        assert saved["v_recon_bayer"].shape == (h, w, frames), f
        assert np.isfinite(saved["v_recon_bayer"]).all(), f
        # synth/handmade files carry ground truth: PSNR must be real
        assert f"{f} -> " in out
    assert out.count("PSNR") >= len(good)


def test_cli_reconstruct_solver_override_flags(tmp_path, scene_mat, capsys):
    """--select-best / --relax / --adapt-crop reach the solver config."""
    warm = str(tmp_path / "warm.mat")
    main(["warmstart", "--data", scene_mat, "--out", warm, "--iters", "8"])
    capsys.readouterr()
    base = ["reconstruct", "--data", scene_mat, "--warm", warm,
            "--name", "Beauty", "--denoiser", "ffdnet"]
    base += (["--ckpt", FFD_CKPT] if os.path.exists(FFD_CKPT)
             else ["--random-init"])

    out1 = str(tmp_path / "r1.mat")
    main(base + ["--out", out1, "--no-select-best", "--relax", "0.5",
                 "--adapt-crop", "16"])
    assert "PSNR" in capsys.readouterr().out

    out2 = str(tmp_path / "r2.mat")
    main(base + ["--out", out2, "--no-select-best"])
    capsys.readouterr()
    a = sio.loadmat(out1)["v_recon_bayer"]
    b = sio.loadmat(out2)["v_recon_bayer"]
    assert np.isfinite(a).all()
    assert not np.array_equal(a, b)  # relax actually changed the solve

    # --select-best on the guarded Beauty row with a random denoiser must
    # return (approximately) the warm start
    if not os.path.exists(FFD_CKPT):
        return
    out3 = str(tmp_path / "r3.mat")
    main(["reconstruct", "--data", scene_mat, "--warm", warm,
          "--name", "Beauty", "--denoiser", "ffdnet", "--random-init",
          "--select-best", "--out", out3])
    capsys.readouterr()
    ws = sio.loadmat(warm)["v_Admm_tv_denoise"]
    got = sio.loadmat(out3)["v_recon_bayer"]
    np.testing.assert_allclose(got, ws, atol=1e-4)
