"""Multi-chip sharding tests on the 8-virtual-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from adaptivepnp_sci_tpu.models.fastdvdnet import FastDVDnet
from adaptivepnp_sci_tpu.parallel import make_mesh
from adaptivepnp_sci_tpu.parallel.sharded import (
    fastdvd_prior_sharded,
    make_dp_train_step,
)
from adaptivepnp_sci_tpu.solvers.priors import fastdvd_prior


def test_eight_virtual_devices():
    assert len(jax.devices()) == 8


@pytest.fixture(scope="module")
def fdvd():
    model = FastDVDnet()
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 5, 16, 16, 3)), jnp.float32(0.1)
    )
    return model, variables


def test_halo_windows_match_unsharded(fdvd):
    """Frame-sharded prior == single-device prior (circular windows intact)."""
    model, variables = fdvd
    mesh = make_mesh(data=2, frame=4)
    rgb = jnp.asarray(
        np.random.default_rng(0).random((8, 16, 16, 3), dtype=np.float32)
    )
    sigma = jnp.float32(0.1)

    want = fastdvd_prior(model).apply(variables, rgb, sigma)

    prior = fastdvd_prior_sharded(model, mesh)
    rgb_sharded = jax.device_put(rgb, NamedSharding(mesh, P("frame")))
    got = prior.apply(variables, rgb_sharded, sigma)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-5, atol=1e-6)


def test_halo_windows_too_many_shards_raises(fdvd):
    """The per-window form needs B_local >= 2 for 5-frame windows (the
    shared-triplet default only needs B_local >= 1 — see
    test_sharded_shared_triplet_full_frame_sharding)."""
    model, variables = fdvd
    mesh = make_mesh(data=1, frame=8)
    prior = fastdvd_prior_sharded(model, mesh, shared_triplet=False)
    rgb = jnp.zeros((8, 16, 16, 3))  # B_local = 1 < halo 2
    with pytest.raises(ValueError, match="too many shards"):
        prior.apply(variables, rgb, jnp.float32(0.1))


def test_dp_train_step_matches_single_device():
    """Gradient all-reduce over the mesh == single-device gradients."""
    import optax

    from adaptivepnp_sci_tpu.models.ffdnet import FFDNet

    model = FFDNet(in_nc=3, out_nc=3, nc=8, nb=3)
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 8, 8, 3)), jnp.float32(0.1)
    )
    optimizer = optax.adam(1e-3)
    opt_state = optimizer.init(variables)

    rng = np.random.default_rng(1)
    noisy = jnp.asarray(rng.random((16, 8, 8, 3), dtype=np.float32))
    clean = jnp.asarray(rng.random((16, 8, 8, 3), dtype=np.float32))
    sigma = jnp.full((16,), 0.1, jnp.float32)

    mesh = make_mesh(data=4, frame=2)
    step, place = make_dp_train_step(model, optimizer, mesh)

    p1, o1, loss_sharded = step(*place(variables, opt_state, noisy, clean, sigma))

    # single device oracle
    def loss_fn(params):
        out = model.apply(params, noisy, sigma)
        return jnp.mean((out - clean) ** 2) / 2.0

    loss_single, grads = jax.value_and_grad(loss_fn)(variables)
    assert abs(float(loss_sharded) - float(loss_single)) < 1e-6
    upd, _ = optimizer.update(grads, opt_state, variables)
    want = optax.apply_updates(variables, upd)
    for a, b in zip(jax.tree_util.tree_leaves(p1), jax.tree_util.tree_leaves(want)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-7)


def test_solver_with_sharded_fastdvd_prior(fdvd):
    """Full two-stage ADMM runs with the frame-sharded prior inside the scan."""
    from adaptivepnp_sci_tpu.data.synthetic import make_scene
    from adaptivepnp_sci_tpu.solvers import ADMMConfig, two_stage_admm

    model, variables = fdvd
    mesh = make_mesh(data=1, frame=4)
    prior = fastdvd_prior_sharded(model, mesh)
    scene = make_scene(b=8, h=16, w=16, seed=3)
    config = ADMMConfig(sigma=(12 / 255,), iters=(3,), denoiser="fastdvd")
    res = two_stage_admm(
        scene.meas, scene.mask, config, prior=prior, variables=variables,
        orig_bayer=scene.orig_bayer,
    )
    assert np.isfinite(np.asarray(res.x_rgb)).all()


def test_global_mesh_single_process():
    from adaptivepnp_sci_tpu.parallel.distributed import global_mesh

    mesh = global_mesh(frame=4)
    assert mesh.devices.shape == (2, 4)
    assert mesh.axis_names == ("data", "frame")


def test_solver_with_frame_sharded_inputs(fdvd):
    """Whole solver with phi/x0 sharded over 'frame': XLA inserts the psum
    for the frame-axis reduction; result equals the unsharded run."""
    from adaptivepnp_sci_tpu.data.synthetic import make_scene
    from adaptivepnp_sci_tpu.solvers import ADMMConfig, two_stage_admm

    model, variables = fdvd
    mesh = make_mesh(data=2, frame=4)
    scene = make_scene(b=8, h=16, w=16, seed=13)
    config = ADMMConfig(sigma=(12 / 255,), iters=(3,), denoiser="fastdvd")

    from adaptivepnp_sci_tpu.solvers.priors import fastdvd_prior
    prior = fastdvd_prior(model)
    want = two_stage_admm(scene.meas, scene.mask, config, prior=prior,
                          variables=variables, orig_bayer=scene.orig_bayer)

    from adaptivepnp_sci_tpu.parallel.sharded import fastdvd_prior_sharded
    sprior = fastdvd_prior_sharded(model, mesh)
    phi_sharded = jax.device_put(jnp.asarray(scene.mask),
                                 NamedSharding(mesh, P("frame")))
    got = two_stage_admm(scene.meas, phi_sharded, config, prior=sprior,
                         variables=variables, orig_bayer=scene.orig_bayer)
    np.testing.assert_allclose(np.asarray(got.x_bayer), np.asarray(want.x_bayer),
                               rtol=1e-4, atol=1e-5)


def test_batched_solver_data_sharded():
    """Throughput mode with the measurement batch sharded over 'data'."""
    from adaptivepnp_sci_tpu.data.synthetic import make_scene
    from adaptivepnp_sci_tpu.models.ffdnet import FFDNet
    from adaptivepnp_sci_tpu.solvers.priors import ffdnet_prior
    from adaptivepnp_sci_tpu.solvers.two_stage_admm import (
        ADMMConfig,
        two_stage_admm_batched,
    )

    mesh = make_mesh(data=4, frame=2)
    model = FFDNet(in_nc=3, out_nc=3, nc=8, nb=3)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 8, 8, 3)),
                           jnp.float32(0.1))
    scene = make_scene(b=4, h=16, w=16, seed=14, n_meas=4)
    y4 = jnp.asarray(scene.meas.transpose(2, 0, 1))
    cfg = ADMMConfig(sigma=(25 / 255,), iters=(2,), denoiser="ffdnet")

    want = two_stage_admm_batched(y4, scene.mask, cfg,
                                  prior=ffdnet_prior(model), variables=variables)
    y4s = jax.device_put(y4, NamedSharding(mesh, P("data")))
    got = two_stage_admm_batched(y4s, scene.mask, cfg,
                                 prior=ffdnet_prior(model), variables=variables)
    np.testing.assert_allclose(np.asarray(got.x_bayer), np.asarray(want.x_bayer),
                               rtol=1e-5, atol=1e-6)


def test_sharded_shared_triplet_matches_seq_circular(fdvd):
    """The two-stage halo-exchange form (temp1 per distinct triplet, 1-frame
    halos between stages) must equal the unsharded shared-triplet sequence
    AND the legacy per-window sharded form."""
    model, variables = fdvd
    mesh = make_mesh(data=1, frame=4)
    rng = np.random.default_rng(3)
    rgb = jnp.asarray(rng.random((8, 16, 16, 3), dtype=np.float32))
    sigma = jnp.float32(0.1)

    want = model.apply(variables, rgb, sigma, method="seq_circular")
    rgb_sharded = jax.device_put(rgb, NamedSharding(mesh, P("frame")))
    got = fastdvd_prior_sharded(model, mesh).apply(variables, rgb_sharded, sigma)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-6)
    legacy = fastdvd_prior_sharded(model, mesh, shared_triplet=False).apply(
        variables, rgb_sharded, sigma)
    np.testing.assert_allclose(np.asarray(got), np.asarray(legacy),
                               rtol=1e-5, atol=1e-6)


def test_sharded_shared_triplet_full_frame_sharding(fdvd):
    """B_local = 1: the shared-triplet form supports one frame per shard
    (8 frames over 8 devices), which the per-window form cannot."""
    model, variables = fdvd
    mesh = make_mesh(data=1, frame=8)
    rng = np.random.default_rng(4)
    rgb = jnp.asarray(rng.random((8, 16, 16, 3), dtype=np.float32))
    sigma = jnp.float32(0.1)
    want = model.apply(variables, rgb, sigma, method="seq_circular")
    rgb_sharded = jax.device_put(rgb, NamedSharding(mesh, P("frame")))
    got = fastdvd_prior_sharded(model, mesh).apply(variables, rgb_sharded, sigma)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-6)
