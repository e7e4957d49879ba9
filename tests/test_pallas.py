"""Fused Pallas x-update kernels vs the jnp oracle (interpret mode on CPU)."""

import jax.numpy as jnp
import numpy as np

from adaptivepnp_sci_tpu.ops import pallas_kernels, physics


def _data(rng, b=8, c=4, h=16, w=128):
    theta = rng.random((b, c, h, w), dtype=np.float32)
    bdual = (rng.random((b, c, h, w), dtype=np.float32) - 0.5) * 0.2
    phi = (rng.random((b, c, h, w)) > 0.5).astype(np.float32)
    y = (rng.random((b, c, h, w), dtype=np.float32) * phi).sum(0)
    phis = phi.sum(0)
    phis[phis == 0] = 1
    return map(jnp.asarray, (theta, bdual, y, phi, phis))


def test_fused_admm_x_update_matches_oracle(rng):
    theta, b, y, phi, phis = _data(rng)
    rho, alpha = 0.55, 1.0
    want = physics.admm_x_update(theta, b, y, phi, phis, rho, alpha)
    got = pallas_kernels.admm_x_update(
        theta, b, y, phi, phis, rho, alpha, interpret=True
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-6)


def test_fused_gap_x_update_matches_oracle(rng):
    theta, b, y, phi, phis = _data(rng)
    want = physics.gap_x_update(theta, b, y, phi, phis, 1.0, 0.01)
    got = pallas_kernels.gap_x_update(
        theta, b, y, phi, phis, 1.0, 0.01, interpret=True
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-6)


def test_fused_kernel_tiled_grid(rng):
    """Shapes matching the 512px benchmark tile path (grid > 1)."""
    theta, b, y, phi, phis = _data(rng, b=4, c=4, h=128, w=256)
    want = physics.admm_x_update(theta, b, y, phi, phis, 1.0, 1.0)
    got = pallas_kernels.admm_x_update(
        theta, b, y, phi, phis, 1.0, 1.0, interpret=True
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-6)


def test_gap_lam_fallback(rng):
    theta, b, y, phi, phis = _data(rng, h=8, w=8)
    want = physics.gap_x_update(theta, b, y, phi, phis, 0.5, 0.01)
    got = pallas_kernels.gap_x_update(theta, b, y, phi, phis, 0.5, 0.01)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-6)


def test_fused_tv_matches_jnp(rng):
    from adaptivepnp_sci_tpu.ops import tv

    x = jnp.asarray(rng.random((2, 4, 24, 24), dtype=np.float32))
    want = tv.tv_chambolle_multichannel(x, 0.1, max_iter=5)
    got = pallas_kernels.tv_chambolle_fused(x, 0.1, max_iter=5, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-6)


def test_tv_fused_large_plane_falls_back(rng):
    """Planes beyond the VMEM budget must route to the jnp path (the Pallas
    fixed point holds ~8 plane buffers; 1024^2 fp32 planes VMEM-OOM at
    compile time — hit by a 2048^2 scene's warm start) and stay
    semantically identical."""
    from adaptivepnp_sci_tpu.ops import tv
    from adaptivepnp_sci_tpu.ops.pallas_kernels import (
        _TV_PLANE_LIVE_BUFFERS,
        _TV_PLANE_VMEM_BUDGET,
        tv_chambolle_fused,
    )

    h = w = 768  # 768^2*4*10 = 23.6MB > budget -> fallback path
    assert h * w * 4 * _TV_PLANE_LIVE_BUFFERS > _TV_PLANE_VMEM_BUDGET
    x = jnp.asarray(rng.random((2, h, w), dtype=np.float32))
    got = tv_chambolle_fused(x, 0.1, max_iter=2)
    want = tv.tv_chambolle_multichannel(x, 0.1, max_iter=2)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
