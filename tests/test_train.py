"""Training subsystem: augmentation, regularizer, tasks, trainer loop, resume."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from adaptivepnp_sci_tpu.models.ddnet import DDnet
from adaptivepnp_sci_tpu.models.fastdvdnet import FastDVDnet
from adaptivepnp_sci_tpu.models.ffdnet import FFDNet
from adaptivepnp_sci_tpu.train import Trainer, TrainerConfig
from adaptivepnp_sci_tpu.train.augment import apply_mode, augment_batch
from adaptivepnp_sci_tpu.train.datasets import (
    batch_iterator,
    extract_patches,
    synthetic_video_dataset,
    temporal_chunks,
)
from adaptivepnp_sci_tpu.train.regularizers import svd_orthogonalize
from adaptivepnp_sci_tpu.train.tasks import ddnet_task, fastdvd_task, ffdnet_task


def test_apply_mode_dihedral_group(rng):
    img = jnp.asarray(rng.random((8, 8, 3), dtype=np.float32))
    outs = [np.asarray(apply_mode(img, jnp.int32(m))) for m in range(8)]
    # all 8 modes distinct for a generic image
    for i in range(8):
        for j in range(i + 1, 8):
            assert not np.allclose(outs[i], outs[j])
    np.testing.assert_array_equal(outs[0], img)
    np.testing.assert_array_equal(outs[4], np.rot90(np.asarray(img), 2, (0, 1)))


def test_augment_batch_shapes(rng):
    batch = jnp.asarray(rng.random((6, 8, 8, 3), dtype=np.float32))
    out = augment_batch(jax.random.PRNGKey(0), batch)
    assert out.shape == batch.shape


def test_svd_orthogonalize_makes_columns_orthonormal(rng):
    k = jnp.asarray(rng.random((3, 3, 8, 4), dtype=np.float32))
    params = {"conv": {"kernel": k, "bias": jnp.zeros((4,))}}
    out = svd_orthogonalize(params)
    mat = np.asarray(out["conv"]["kernel"]).reshape(-1, 4)
    np.testing.assert_allclose(mat.T @ mat, np.eye(4), atol=1e-5)
    np.testing.assert_array_equal(np.asarray(out["conv"]["bias"]), 0)


def test_extract_patches_counts():
    img = np.zeros((40, 40, 3), np.float32)
    p = extract_patches(img, patch=16, stride=8, scales=(1.0,))
    assert p.shape == (16, 16, 16, 3)
    p2 = extract_patches(img, patch=16, stride=8)  # multiscale adds more
    assert p2.shape[0] > 16


def test_temporal_chunks():
    v = np.zeros((12, 8, 8, 3), np.float32)
    c = temporal_chunks(v, length=5, stride=3)
    assert c.shape == (3, 5, 8, 8, 3)


def _loss_curve(trainer, data, steps):
    losses = trainer.fit(batch_iterator(data, 4, seed=0), max_steps=steps,
                         log_every=10**9)
    return losses


def test_ffdnet_training_reduces_loss():
    model = FFDNet(in_nc=3, out_nc=3, nc=8, nb=3)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 16, 16, 3)),
                           jnp.float32(0.1))
    clips = synthetic_video_dataset(8, length=1, size=16, seed=0)[:, 0]
    trainer = Trainer(
        ffdnet_task(model), variables,
        TrainerConfig(lr=1e-3, steps_per_epoch=10, milestones=(5, 8)),
    )
    losses = _loss_curve(trainer, clips, 40)
    assert np.mean(losses[-10:]) < np.mean(losses[:10])


def test_fastdvd_training_step_updates_bn_stats():
    model = FastDVDnet()
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 5, 16, 16, 3)),
                           jnp.float32(0.1))
    clips = synthetic_video_dataset(4, length=5, size=16, seed=1)
    trainer = Trainer(
        fastdvd_task(model), variables,
        TrainerConfig(lr=1e-4, steps_per_epoch=10),
    )
    before = jax.tree_util.tree_leaves(variables["batch_stats"])
    trainer.fit(batch_iterator(clips, 2, seed=0), max_steps=2, log_every=10**9)
    after = jax.tree_util.tree_leaves(trainer.variables["batch_stats"])
    assert any(not np.allclose(np.asarray(a), np.asarray(b))
               for a, b in zip(before, after))


def test_fastdvd_distillation_loss_blend():
    """``teacher`` swaps the target: w=0 reproduces the plain clean-target
    loss exactly; w=1 is pure teacher-matching and must differ from it.
    (The production use distills the real-weight FFDNet operator into
    FastDVDnet — ``scripts/distill_fastdvd.py``.)"""
    model = FastDVDnet()
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 5, 16, 16, 3)),
                           jnp.float32(0.1))
    clips = jnp.asarray(synthetic_video_dataset(4, length=5, size=16, seed=3))
    key = jax.random.PRNGKey(7)

    def teacher(noisy_center, sigma):  # shape-preserving, sigma-aware
        return noisy_center * 0.5 + sigma.reshape(-1, 1, 1, 1)

    plain, _ = fastdvd_task(model).loss_fn(variables, key, clips)
    w0, _ = fastdvd_task(model, teacher=teacher, distill_weight=0.0).loss_fn(
        variables, key, clips)
    w1, _ = fastdvd_task(model, teacher=teacher, distill_weight=1.0).loss_fn(
        variables, key, clips)
    np.testing.assert_allclose(np.asarray(w0), np.asarray(plain), rtol=1e-6)
    assert np.isfinite(float(w1)) and abs(float(w1) - float(plain)) > 1e-6
    grads = jax.grad(
        lambda v: fastdvd_task(model, teacher=teacher).loss_fn(v, key, clips)[0]
    )(variables)["params"]
    assert all(np.isfinite(np.asarray(g)).all()
               for g in jax.tree_util.tree_leaves(grads))


def test_fastdvd_distill_iterates_task():
    """Probe-point distillation: iterate probes pass through un-noised
    (needs_noise=0), synth probes get fresh noise; jac_weight adds a finite
    Jacobian-matching term with finite grads."""
    from adaptivepnp_sci_tpu.train.datasets import paired_batch_iterator
    from adaptivepnp_sci_tpu.train.tasks import fastdvd_distill_task

    model = FastDVDnet()
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 5, 16, 16, 3)),
                           jnp.float32(0.1))
    clips = jnp.asarray(synthetic_video_dataset(4, length=5, size=16, seed=5))
    sigmas = jnp.asarray(np.float32([0.05, 0.1, 0.15, 0.2]))
    flags = jnp.asarray(np.float32([0, 0, 1, 1]))
    key = jax.random.PRNGKey(11)

    def teacher(center, sigma):
        return center * 0.9 + sigma.reshape(-1, 1, 1, 1) * 0.1

    for jw in (0.0, 0.1):
        task = fastdvd_distill_task(model, teacher, jac_weight=jw)
        loss, mutated = task.loss_fn(variables, key, (clips, sigmas, flags))
        assert np.isfinite(float(loss)) and "batch_stats" in mutated
        grads = jax.grad(
            lambda p: task.loss_fn(
                {**variables, "params": p}, key, (clips, sigmas, flags))[0]
        )(variables["params"])
        assert all(np.isfinite(np.asarray(g)).all()
                   for g in jax.tree_util.tree_leaves(grads))

    # jac term changes the loss (the toy teacher's Jacobian is 0.9*I on the
    # center frame; the freshly-initialized student's is not)
    l0, _ = fastdvd_distill_task(model, teacher, 0.0).loss_fn(
        variables, key, (clips, sigmas, flags))
    l1, _ = fastdvd_distill_task(model, teacher, 0.1).loss_fn(
        variables, key, (clips, sigmas, flags))
    assert abs(float(l1) - float(l0)) > 1e-8

    # paired iterator keeps rows aligned and yields tuple batches the
    # Trainer can consume as a pytree
    b = next(paired_batch_iterator(
        (np.arange(8), np.arange(8) * 10.0), 4, seed=0))
    np.testing.assert_array_equal(b[0] * 10.0, b[1])

    trainer = Trainer(
        fastdvd_distill_task(model, teacher), variables,
        TrainerConfig(lr=1e-4, steps_per_epoch=2, seed=0),
    )
    losses = trainer.fit(
        paired_batch_iterator((clips, sigmas, flags), 2, seed=0), max_steps=2)
    assert np.isfinite(losses).all()


def test_ddnet_training_reduces_loss():
    model = DDnet()
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 5, 16, 16, 3)))
    clips = synthetic_video_dataset(8, length=5, size=16, seed=2)
    trainer = Trainer(
        ddnet_task(model), variables,
        TrainerConfig(lr=5e-4, steps_per_epoch=10),
    )
    losses = _loss_curve(trainer, clips, 30)
    assert np.mean(losses[-5:]) < np.mean(losses[:5])


def test_checkpoint_resume_roundtrip(tmp_path):
    model = FFDNet(in_nc=3, out_nc=3, nc=4, nb=3)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 8, 8, 3)),
                           jnp.float32(0.1))
    clips = synthetic_video_dataset(4, length=1, size=8, seed=3)[:, 0]
    cfg = TrainerConfig(lr=1e-3, steps_per_epoch=5,
                        ckpt_dir=str(tmp_path / "ckpt"))
    t1 = Trainer(ffdnet_task(model), variables, cfg)
    t1.fit(batch_iterator(clips, 2, seed=0), max_steps=3, log_every=10**9)
    path = str(tmp_path / "ckpt" / "manual")
    t1.save(path)

    t2 = Trainer(ffdnet_task(model), variables, cfg)
    t2.restore(path)
    assert t2.step == 3
    for a, b in zip(jax.tree_util.tree_leaves(t1.variables),
                    jax.tree_util.tree_leaves(t2.variables)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))


def test_milestone_lr_schedule():
    model = FFDNet(in_nc=3, out_nc=3, nc=4, nb=3)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 8, 8, 3)),
                           jnp.float32(0.1))
    cfg = TrainerConfig(lr=1e-2, steps_per_epoch=2, milestones=(1, 2))
    t = Trainer(ffdnet_task(model), variables, cfg)
    sched = t.optimizer  # schedule embedded; probe via schedule fn
    import optax

    s = optax.piecewise_constant_schedule(1e-2, {4: 0.1, 6: 0.01})
    assert abs(float(s(0)) - 1e-2) < 1e-9
    assert abs(float(s(5)) - 1e-3) < 1e-9
    assert abs(float(s(7)) - 1e-5) < 1e-9


def test_patch_db_roundtrip(tmp_path):
    import numpy as np

    from adaptivepnp_sci_tpu.train.datasets import read_patch_db, write_patch_db

    rng = np.random.default_rng(0)
    patches = rng.random((20, 16, 16, 3)).astype(np.float32)
    path = str(tmp_path / "patches.h5")
    write_patch_db(path, patches)
    back = read_patch_db(path)
    np.testing.assert_array_equal(back, patches)


def _sigma_max_eval(model, variables, clips, key, iters=6):
    """Power-iteration estimate of the eval-mode Jacobian's top singular
    value, averaged over the batch (independent oracle for the penalty)."""
    sigma = jnp.full((clips.shape[0],), 20 / 255)

    def f(x):
        return model.apply(variables, x, sigma)

    u = jax.random.normal(key, clips.shape, jnp.float32)
    u = u / jnp.sqrt(jnp.sum(u * u, axis=(1, 2, 3, 4), keepdims=True))
    for _ in range(iters):
        _, ju = jax.jvp(f, (clips,), (u,))
        _, vjp_fn = jax.vjp(f, clips)
        u = vjp_fn(ju)[0]
        u = u / jnp.sqrt(jnp.maximum(
            jnp.sum(u * u, axis=(1, 2, 3, 4), keepdims=True), 1e-20))
    _, ju = jax.jvp(f, (clips,), (u,))
    return float(jnp.mean(jnp.sqrt(jnp.sum(ju * ju, axis=(1, 2, 3)))))


def test_spectral_penalty_contracts_eval_jacobian():
    """Training WITH the power-iteration spectral penalty must end with a
    smaller eval-mode Jacobian norm than training without it."""
    model = FastDVDnet()
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 5, 16, 16, 3)),
                           jnp.float32(0.1))
    clips = synthetic_video_dataset(8, length=5, size=16, seed=3)
    probe = jnp.asarray(clips[:4])
    key = jax.random.PRNGKey(11)

    def run(penalty):
        trainer = Trainer(
            fastdvd_task(model, spectral_penalty=penalty, spectral_iters=2,
                         spectral_target=0.8),
            variables,
            TrainerConfig(lr=2e-3, steps_per_epoch=100,
                          milestones=(10**4, 2 * 10**4)),
        )
        trainer.fit(batch_iterator(clips, 4, seed=0), max_steps=25,
                    log_every=10**9)
        return _sigma_max_eval(model, trainer.variables, probe, key)

    sig_plain = run(0.0)
    sig_sn = run(5.0)
    assert np.isfinite(sig_plain) and np.isfinite(sig_sn)
    assert sig_sn < sig_plain


def test_synthetic_dataset_crops_from_large_sources():
    a = synthetic_video_dataset(10, length=3, size=32,
                                source_sizes=(64, 128), seed=5)
    assert a.shape == (10, 3, 32, 32, 3)
    assert a.min() >= 0.0 and a.max() <= 1.0
    b = synthetic_video_dataset(10, length=3, size=32,
                                source_sizes=(64, 128), seed=5)
    np.testing.assert_array_equal(a, b)  # deterministic in seed
    # crop statistics differ from directly-generated clips at the same size
    # (larger-scale features -> smoother patches on average)
    direct = synthetic_video_dataset(10, length=3, size=32, seed=5)
    tv_crop = np.abs(np.diff(a, axis=2)).mean()
    tv_direct = np.abs(np.diff(direct, axis=2)).mean()
    assert tv_crop < tv_direct


def test_synthetic_dataset_style_mix():
    mix = synthetic_video_dataset(16, length=3, size=32,
                                  source_sizes=(64, 128), seed=5,
                                  styles=("smooth", "leaves"))
    assert mix.shape == (16, 3, 32, 32, 3)
    assert mix.min() >= 0.0 and mix.max() <= 1.0
    again = synthetic_video_dataset(16, length=3, size=32,
                                    source_sizes=(64, 128), seed=5,
                                    styles=("smooth", "leaves"))
    np.testing.assert_array_equal(mix, again)  # deterministic in seed
    # dead-leaves occlusion edges -> heavier-tailed gradients than smooth blobs
    smooth = synthetic_video_dataset(16, length=3, size=32,
                                     source_sizes=(64, 128), seed=5)

    def kurtosis(x):
        g = np.diff(x[..., 0], axis=-1).ravel()
        return float(((g - g.mean()) ** 4).mean() / (g.var() ** 2 + 1e-12))

    assert kurtosis(mix) > 2 * kurtosis(smooth)
    # styles also works on the direct (no source crop) path
    direct = synthetic_video_dataset(4, length=3, size=32, seed=5,
                                     styles=("leaves",))
    assert direct.shape == (4, 3, 32, 32, 3)
    with np.testing.assert_raises(ValueError):
        synthetic_video_dataset(2, length=3, size=16, styles=("nope",))


def test_normalize_augment_reference_semantics():
    from adaptivepnp_sci_tpu.train.augment import normalize_augment

    batch = jnp.asarray(
        np.random.default_rng(0).random((4, 5, 8, 8, 3)).astype(np.float32)
        * 255.0
    )
    # identity mode is the most likely single mode; find a key that picks it
    out, gt = normalize_augment(jax.random.PRNGKey(0), batch)
    assert out.shape == batch.shape and gt.shape == (4, 8, 8, 3)
    assert float(out.max()) <= 1.5 and float(out.min()) >= -0.5  # scaled /255
    np.testing.assert_allclose(np.asarray(gt), np.asarray(out[:, 2]))
    # over many keys, outputs vary (transforms actually fire) and the
    # constant-offset branch shows up (some output exceeds [0,1] slightly
    # or differs from any dihedral of the scaled input)
    outs = [np.asarray(normalize_augment(jax.random.PRNGKey(k), batch)[0])
            for k in range(30)]
    assert any(not np.allclose(o, outs[0]) for o in outs[1:])
