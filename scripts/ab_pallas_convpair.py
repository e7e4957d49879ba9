"""A/B: fused Pallas CvBlock (3x3 conv -> BN -> ReLU -> 3x3 conv -> BN ->
ReLU) vs XLA's two separate convs, at FastDVDnet's real shapes.

Motivation (ROADMAP 'fused DenBlock' line, VERDICT r3 item 7): the FastDVD
config floor decomposes to ~42 ms/it of U-Net running at 17% bf16 peak /
51% HBM peak — a fully fused in-VMEM DenBlock bounds the win at ~2x,
ASSUMING a hand kernel sustains XLA's conv throughput while eliding the
inter-conv HBM round trip. This script measures that assumption on the
CvBlock pair (the U-Net's repeated unit, 2 of the ~12 convs fused, halo 2):

  * the Pallas kernel computes conv1 on a (TH+2, TW+2) interior from a
    (TH+4, TW+4) halo tile (9 shifted MXU dots per conv), applies the
    folded BN scale/shift + ReLU in VMEM, computes conv2, and writes the
    (TH, TW) result — ONE HBM read + ONE write for two convs;
  * XLA runs the same pair as two `lax.conv_general_dilated` calls with
    the elementwise BN/ReLU fused into them (its own strength).

Correctness is asserted against the XLA pair before timing. Interpreting
the result: fused_time < xla_time means the DenBlock fusion bound is
harvestable and the kernel should be productionized; fused >= xla means
Pallas-achievable conv rates refute the bound (the MXU at C<=64 reduce
dims, not HBM, is the binding constraint) — record either in RESULTS.md.

Usage: python scripts/ab_pallas_convpair.py [C] [HW] [N]
Defaults: the two heaviest CvBlock shapes, C=64@256^2 and C=32@512^2, N=8.
"""

from __future__ import annotations

import functools
import sys
import time

sys.path.insert(0, ".")

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.jax_bench_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _convpair_kernel(x_hbm, w1_ref, s1_ref, b1_ref, w2_ref, s2_ref, b2_ref,
                     o_ref, xtile, h1tile, sem, *, th: int, tw: int, c: int):
    """One (TH, TW) output tile from a (TH+4, TW+4) halo'd input tile.

    Halo tiles OVERLAP, so the input stays in HBM and each grid step DMAs
    its own (th+4, tw+4) window into VMEM scratch. conv1 produces the
    (TH+2, TW+2) interior needed by conv2's halo; both convs are 9 shifted
    (rows, C) x (C, C) MXU dots accumulated in fp32; BN is pre-folded into
    per-channel scale/shift.
    """
    ni = pl.program_id(0)
    i = pl.program_id(1)
    j = pl.program_id(2)
    # Mosaic constraint: DMA slice extents on the sublane dim must be
    # 8-aligned — fetch (th+8, tw+8) and use only the (th+4, tw+4) halo
    cp = pltpu.make_async_copy(
        x_hbm.at[ni, pl.ds(i * th, th + 8), pl.ds(j * tw, tw + 8), :],
        xtile, sem,
    )
    cp.start()
    cp.wait()

    def conv9(src_ref, w_ref, hh, ww):
        # slice the VMEM ref per window (loads stay in the ref; avoids one
        # whole-tile materialization + lets Mosaic schedule the shifted
        # loads against the dots)
        acc = jnp.zeros((hh * ww, c), jnp.float32)
        for dy in range(3):
            for dx in range(3):
                window = src_ref[dy:dy + hh, dx:dx + ww, :].reshape(
                    hh * ww, c)
                acc += jnp.dot(window, w_ref[dy, dx],
                               preferred_element_type=jnp.float32)
        return acc

    h1 = conv9(xtile, w1_ref, th + 2, tw + 2)
    h1 = jnp.maximum(h1 * s1_ref[...] + b1_ref[...], 0.0)
    h1 = h1.reshape(th + 2, tw + 2, c)
    # conv2's zero padding applies to h1 at IMAGE borders: zero the halo
    # rows/cols of h1 that fall outside the image (XLA/torch semantics —
    # computed-through h1 there is relu(b1) != 0)
    n_i = pl.num_programs(1) * th
    n_j = pl.num_programs(2) * tw
    ri = jax.lax.broadcasted_iota(jnp.int32, (th + 2, tw + 2, 1), 0) \
        + i * th - 1
    cj = jax.lax.broadcasted_iota(jnp.int32, (th + 2, tw + 2, 1), 1) \
        + j * tw - 1
    inside = ((ri >= 0) & (ri < n_i) & (cj >= 0) & (cj < n_j))
    h1tile[...] = jnp.where(inside, h1, 0.0).astype(o_ref.dtype)
    h2 = conv9(h1tile, w2_ref, th, tw)
    h2 = jnp.maximum(h2 * s2_ref[...] + b2_ref[...], 0.0)
    o_ref[...] = h2.reshape(1, th, tw, c).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("th", "tw"))
def pallas_convpair(x, w1, s1, b1, w2, s2, b2, th=128, tw=128):
    """x (N, H, W, C) bf16 -> fused CvBlock, zero-padded borders (matches
    padding=1 convs)."""
    n, h, w, c = x.shape
    xp = jnp.pad(x, ((0, 0), (2, 6), (2, 6), (0, 0)))
    grid = (n, h // th, w // tw)
    kernel = functools.partial(_convpair_kernel, th=th, tw=tw, c=c)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),  # halo-DMA'd manually
            pl.BlockSpec((3, 3, c, c), lambda ni, i, j: (0, 0, 0, 0)),
            pl.BlockSpec((1, c), lambda ni, i, j: (0, 0)),
            pl.BlockSpec((1, c), lambda ni, i, j: (0, 0)),
            pl.BlockSpec((3, 3, c, c), lambda ni, i, j: (0, 0, 0, 0)),
            pl.BlockSpec((1, c), lambda ni, i, j: (0, 0)),
            pl.BlockSpec((1, c), lambda ni, i, j: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, th, tw, c), lambda ni, i, j: (ni, i, j, 0)),
        out_shape=jax.ShapeDtypeStruct((n, h, w, c), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((th + 8, tw + 8, c), jnp.bfloat16),
            pltpu.VMEM((th + 2, tw + 2, c), jnp.bfloat16),
            pltpu.SemaphoreType.DMA,
        ],
    )(xp, w1, s1, b1, w2, s2, b2)


def xla_convpair(x, w1, s1, b1, w2, s2, b2):
    def conv(v, w):
        return jax.lax.conv_general_dilated(
            v, w.astype(v.dtype), (1, 1), ((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))

    h1 = jnp.maximum(conv(x, w1).astype(jnp.float32) * s1 + b1, 0.0)
    h2 = jnp.maximum(
        conv(h1.astype(x.dtype), w2).astype(jnp.float32) * s2 + b2, 0.0)
    return h2.astype(x.dtype)


def bench(f, x, *weights, iters=50, reps=6):
    """Per-application time of ``f`` with the iteration loop IN-GRAPH.

    The axon tunnel adds 30-100 ms of dispatch RTT per call (ROADMAP), so
    per-op timing must amortize one dispatch over many applications:
    C->C lets us chain f on its own output inside one jitted fori_loop.
    """
    @jax.jit
    def loop(v):
        return jax.lax.fori_loop(
            0, iters, lambda _, u: f(u, *weights), v)

    out1 = f(x, *weights)          # single application, for correctness
    out = loop(x)
    float(jnp.sum(out.astype(jnp.float32)))  # force completion (tunnel)
    best = 1e9
    for _ in range(reps):
        t0 = time.perf_counter()
        out = loop(x)
        float(jnp.sum(out.astype(jnp.float32)))
        best = min(best, time.perf_counter() - t0)
    return best / iters, out1


def main(c: int = 64, hw: int = 256, n: int = 8, th: int = 128) -> None:
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((n, hw, hw, c)), jnp.bfloat16)
    mk = lambda *s: jnp.asarray(  # noqa: E731
        rng.standard_normal(s) * 0.1, jnp.float32)
    w1, w2 = mk(3, 3, c, c).astype(jnp.bfloat16), mk(3, 3, c, c).astype(jnp.bfloat16)
    s1, b1, s2, b2 = mk(1, c), mk(1, c), mk(1, c), mk(1, c)

    t_xla, ref = bench(jax.jit(xla_convpair), x, w1, s1, b1, w2, s2, b2)
    t_pal, got = bench(
        functools.partial(pallas_convpair, th=th, tw=th),
        x, w1, s1, b1, w2, s2, b2)

    err = float(jnp.max(jnp.abs(got.astype(jnp.float32) -
                                ref.astype(jnp.float32))))
    scale = float(jnp.max(jnp.abs(ref.astype(jnp.float32)))) or 1.0
    # correctness gate BEFORE any timing verdict is recorded (bf16-level)
    assert err / scale < 2e-2, f"fused kernel wrong: rel err {err/scale:.2e}"
    gb = 2 * x.size * 2 / 1e9  # one read + one write, bf16
    flops = 2 * 2 * n * hw * hw * c * c * 9
    print(f"C={c} {hw}^2 N={n} tile={th}: XLA pair {t_xla*1e3:.3f} ms, "
          f"Pallas fused {t_pal*1e3:.3f} ms "
          f"({t_xla/t_pal:.2f}x), rel err {err/scale:.2e}; "
          f"fused streams {gb/t_pal:.0f} GB/s, {flops/t_pal/1e12:.1f} TF/s")


if __name__ == "__main__":
    a = [int(v) for v in sys.argv[1:]]
    if a:
        main(*a)
    else:
        main(64, 256, 8)
        main(32, 512, 8)
