"""NumPy-oracle parity tests for the SCI forward model and solver updates."""

import jax.numpy as jnp
import numpy as np

from adaptivepnp_sci_tpu.ops import physics


def _data(rng, b=8, c=4, h=16, w=16):
    x = rng.random((b, c, h, w), dtype=np.float32)
    phi = (rng.random((b, c, h, w)) > 0.5).astype(np.float32)
    return x, phi


def test_forward_matches_numpy(rng):
    x, phi = _data(rng)
    got = physics.forward(jnp.asarray(x), jnp.asarray(phi))
    np.testing.assert_allclose(got, (x * phi).sum(0), rtol=1e-6)


def test_adjoint_matches_numpy(rng):
    x, phi = _data(rng)
    y = (x * phi).sum(0)
    got = physics.adjoint(jnp.asarray(y), jnp.asarray(phi))
    np.testing.assert_allclose(got, y[None] * phi, rtol=1e-6)


def test_adjoint_is_transpose_of_forward(rng):
    """<A x, y> == <x, At y> -- the operators are genuinely adjoint."""
    x, phi = _data(rng)
    y = rng.random(phi.shape[1:], dtype=np.float32)
    lhs = float((physics.forward(jnp.asarray(x), jnp.asarray(phi)) * y).sum())
    rhs = float((jnp.asarray(x) * physics.adjoint(jnp.asarray(y), jnp.asarray(phi))).sum())
    assert abs(lhs - rhs) / abs(lhs) < 1e-5


def test_phi_sum_zero_guard(rng):
    _, phi = _data(rng)
    phi[:, 0, 0, 0] = 0.0  # pixel never sampled
    s = physics.phi_sum(jnp.asarray(phi))
    assert s[0, 0, 0] == 1.0
    want = phi.sum(0)
    want[want == 0] = 1.0
    np.testing.assert_allclose(np.asarray(s), want, rtol=1e-6)


def test_gap_x_update_oracle(rng):
    x, phi = _data(rng)
    theta = rng.random(x.shape, dtype=np.float32)
    b = rng.random(x.shape, dtype=np.float32) * 0.1
    y = (x * phi).sum(0)
    phis = phi.sum(0)
    phis[phis == 0] = 1

    got = physics.gap_x_update(
        jnp.asarray(theta), jnp.asarray(b), jnp.asarray(y), jnp.asarray(phi),
        jnp.asarray(phis), lam=1.0, gamma=0.01,
    )
    p = theta + b
    yb = (p * phi).sum(0)
    want = p + phi * ((y - yb) / (phis + 0.01))[None]
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_admm_x_update_oracle(rng):
    x, phi = _data(rng)
    theta = rng.random(x.shape, dtype=np.float32)
    b = rng.random(x.shape, dtype=np.float32) * 0.1
    y = (x * phi).sum(0)
    phis = phi.sum(0)
    phis[phis == 0] = 1
    rho, alpha = 0.55, 1.0

    got = physics.admm_x_update(
        jnp.asarray(theta), jnp.asarray(b), jnp.asarray(y), jnp.asarray(phi),
        jnp.asarray(phis), rho=rho, alpha=alpha,
    )
    p = theta - b / rho
    yb = (p * phi).sum(0)
    want = p + phi * ((y - yb) / (alpha * rho + phis))[None]
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_noiseless_constant_scene_exact_recovery(rng):
    """With full mask coverage and a constant scene, one GAP step recovers it."""
    b, c, h, w = 4, 4, 8, 8
    phi = np.ones((b, c, h, w), np.float32)
    x = np.full((b, c, h, w), 0.5, np.float32)
    y = (x * phi).sum(0)
    phis = phi.sum(0)
    got = physics.gap_x_update(
        jnp.zeros_like(x), jnp.zeros_like(x), jnp.asarray(y),
        jnp.asarray(phi), jnp.asarray(phis), lam=1.0, gamma=0.0,
    )
    np.testing.assert_allclose(got, x, rtol=1e-6)
