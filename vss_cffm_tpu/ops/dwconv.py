"""Fused 3×3 depthwise conv (+bias, +exact GELU) — Pallas TPU kernel.

The MixFFN's depthwise conv (reference ``mix_transformer.py:358-369``) is the
single most expensive op family in the backbone under XLA (~1.2 ms of a
~5.5 ms CFFM-B1 forward): XLA emits it as a VPU fusion with poor locality
and runs the following GELU as a separate HBM pass. This kernel tiles rows
into VMEM, computes the 9 shifted fused multiply-adds in f32, and applies
bias + exact (erf) GELU in-register — one HBM read and one write total.

API: ``dwconv3x3(x, kernel, bias, gelu=...)`` with x (B, H, W, C) NHWC and
kernel (3, 3, 1, C) (flax depthwise layout). Falls back to
``lax.conv_general_dilated`` off-TPU (CPU tests, interpret).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["dwconv3x3"]


def _largest_divisor(n: int, cap: int) -> int:
    for d in range(min(n, cap), 0, -1):
        if n % d == 0:
            return d
    return 1


# erf(z) = tanh(z·P(z²)): weighted-least-squares fit of atanh(erf(z))/z in
# z² over [0, 3.94], error equalized in the erf domain by a (1−erf²) weight.
# Max abs err 6.6e-8 over [0, ∞) — tighter than the Abramowitz–Stegun 7.1.26
# rational (1.5e-7) this replaced, and ~2.5× cheaper on the VPU: Horner FMAs
# plus one tanh, no divide and no exp (Mosaic has no native erf lowering; at
# bf16 the two forms agree to within ~1 ulp over all finite inputs — both
# show the same 117 mismatches vs exact erf-GELU, all deep-tail values where
# gelu(x)≈1e-5; the exact onset of the 1-ulp differences depends on the
# platform's tanh/exp transcendentals).
_ERF_C = (1.1283797283039090e+00, 1.0276506824633368e-01,
          -1.8315513884083339e-04, -6.2696684114875293e-04,
          9.0239133545320826e-05, -6.0798218901600598e-06,
          1.6477469166030436e-07)


def _erf(x):
    u = x * x
    p = jnp.full_like(x, _ERF_C[-1])
    for c in _ERF_C[-2::-1]:
        p = p * u + c
    return jnp.tanh(x * p)


def _gelu_exact(x):
    return 0.5 * x * (1.0 + _erf(x * 0.7071067811865476))


def _kernel(x_hbm, w_ref, b_ref, o_ref, slab, sem, *, th: int, w: int, cb: int, gelu: bool):
    """One program = one (batch, channel-block); double-buffered row tiles.

    Depthwise channels are independent, so channel blocks never need halos;
    the row halo (±1) is handled by DMAing overlapping (th+2)-row slabs from
    HBM — BlockSpecs can't express overlapping tiles, manual DMA can.
    """
    bi = pl.program_id(0)
    ci = pl.program_id(1)
    n_tiles = o_ref.shape[1] // th  # static
    wk = w_ref[:]  # (3, 3, cb) f32
    bb = b_ref[0]  # (cb,) f32

    def tile_dma(slot, t):
        return pltpu.make_async_copy(
            x_hbm.at[bi, pl.ds(t * th, th + 2), :, pl.ds(ci * cb, cb)],
            slab.at[slot],
            sem.at[slot],
        )

    tile_dma(0, 0).start()

    def body(t, _):
        slot = t % 2
        nxt = (t + 1) % 2

        @pl.when(t + 1 < n_tiles)
        def _():
            tile_dma(nxt, t + 1).start()

        tile_dma(slot, t).wait()
        x = slab[slot]  # (th+2, Wp, cb); Wp 8-aligned, zero side padding
        wp = x.shape[1]
        # W shifts as native sublane rolls (wrap-around lands in the zero
        # padding columns, never read back into cols [0, w)); H shifts as
        # untiled axis-0 slices — both stay layout-aligned, unlike direct
        # (dj : dj+w) slicing which forced misaligned retiling.
        xf = x.astype(jnp.float32)  # Mosaic rotate requires 32-bit data
        acc = jnp.zeros((th, wp, cb), jnp.float32)
        for dj in range(3):
            shifted = xf if dj == 0 else pltpu.roll(xf, wp - dj, 1)
            for di in range(3):
                acc = acc + shifted[di : di + th] * wk[di, dj]
        acc = acc + bb
        if gelu:
            acc = _gelu_exact(acc)
        o_ref[0, pl.ds(t * th, th)] = acc[:, :w].astype(o_ref.dtype)
        return 0

    jax.lax.fori_loop(0, n_tiles, body, 0)


@functools.partial(jax.jit, static_argnames=("gelu", "interpret"))
def _dwconv3x3_pallas(x, kernel, bias, gelu: bool = False, interpret: bool = False):
    b, h, w, c = x.shape
    cb = _largest_divisor(c, 128) if c >= 128 else c
    th = _largest_divisor(h, 24)
    # pad W so the DMA slab's second-to-last dim aligns to the 8-sublane tile
    wp = -(-(w + 2) // 8) * 8
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, wp - w - 1), (0, 0)))
    wk = kernel.reshape(3, 3, -1).astype(jnp.float32)
    bb = bias.astype(jnp.float32).reshape(1, c)
    grid = (b, c // cb)
    return pl.pallas_call(
        functools.partial(_kernel, th=th, w=w, cb=cb, gelu=gelu),
        out_shape=jax.ShapeDtypeStruct((b, h, w, c), x.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),  # stays in HBM; DMA'd per tile
            pl.BlockSpec((3, 3, cb), lambda i, j: (0, 0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, cb), lambda i, j: (0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, h, w, cb), lambda i, j: (i, 0, 0, j),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, th + 2, wp, cb), x.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(xp, wk, bb)


def _dwconv3x3_shifts(x, kernel, bias, gelu: bool = False):
    """dwconv as 9 shifted multiply-adds — one XLA loop fusion, no conv emitter.

    Lets XLA fuse the whole op (taps + bias + GELU) into a single elementwise
    pass over NHWC data in whatever layout the producers already use,
    avoiding the conv emitter's layout round-trips.
    """
    b, h, w, c = x.shape
    # accumulate the 9 taps in f32 (the conv emitter also accumulates f32):
    # the ops fuse into one loop fusion, so HBM traffic stays bf16
    k = kernel.reshape(3, 3, c).astype(jnp.float32)
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    acc = None
    for di in range(3):
        for dj in range(3):
            term = xp[:, di : di + h, dj : dj + w, :].astype(jnp.float32) * k[di, dj]
            acc = term if acc is None else acc + term
    acc = acc + bias.astype(jnp.float32)
    if gelu:
        acc = jax.nn.gelu(acc, approximate=False)
    return acc.astype(x.dtype)


def _gelu_grad(z):
    """d/dz gelu(z) = Φ(z) + z·φ(z) (exact-erf GELU)."""
    zf = z.astype(jnp.float32)
    phi = jnp.exp(-0.5 * zf * zf) * 0.3989422804014327  # 1/√(2π)
    big_phi = 0.5 * (1.0 + jax.lax.erf(zf * 0.7071067811865476))
    return big_phi + zf * phi


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def _dwconv3x3_shifts_cvjp(x, kernel, bias, gelu: bool = False):
    """'shifts' dwconv with a HAND-WRITTEN backward.

    Autodiff through the 9-tap shift graph compiles pathologically slowly
    (minutes — round-2 finding that kept training on the conv emitter);
    the hand-written VJP below is the same three clean 9-tap passes the
    forward uses (dx = flipped-kernel correlation of the cotangent,
    dk/dbias = 9+1 multiply-reduces), so both compile and run like the
    forward. Matches the conv path's precision plan: bf16 HBM residuals,
    f32 tap accumulation.
    """
    return _dwconv3x3_shifts(x, kernel, bias, gelu)


def _shifts_cvjp_fwd(x, kernel, bias, gelu: bool):
    b, h, w, c = x.shape
    k = kernel.reshape(3, 3, c).astype(jnp.float32)
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    acc = None
    for di in range(3):
        for dj in range(3):
            term = xp[:, di : di + h, dj : dj + w, :].astype(jnp.float32) * k[di, dj]
            acc = term if acc is None else acc + term
    z = acc + bias.astype(jnp.float32)
    y = jax.nn.gelu(z, approximate=False) if gelu else z
    # pre-activation residual stored in x.dtype (the conv path's autodiff
    # residual is likewise the bf16 conv output)
    return y.astype(x.dtype), (x, kernel, bias, z.astype(x.dtype) if gelu else None)


def _shifts_cvjp_bwd(gelu: bool, res, g):
    x, kernel, bias, z = res
    b, h, w, c = x.shape
    k = kernel.reshape(3, 3, c).astype(jnp.float32)
    gz_f = g.astype(jnp.float32)
    if gelu:
        gz_f = gz_f * _gelu_grad(z)
    gz = gz_f.astype(x.dtype)  # one bf16 materialization; read 9× below
    # dx: correlation of the cotangent with the 180°-flipped kernel
    gp = jnp.pad(gz, ((0, 0), (1, 1), (1, 1), (0, 0)))
    dx = None
    for di in range(3):
        for dj in range(3):
            term = (
                gp[:, 2 - di : 2 - di + h, 2 - dj : 2 - dj + w, :].astype(jnp.float32)
                * k[di, dj]
            )
            dx = term if dx is None else dx + term
    # dk[di,dj,c] = Σ_{b,h,w} x_pad[di+y, dj+x, c] · gz[y, x, c]
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    taps = [
        jnp.sum(
            xp[:, di : di + h, dj : dj + w, :].astype(jnp.float32) * gz_f,
            axis=(0, 1, 2),
        )
        for di in range(3)
        for dj in range(3)
    ]
    dk = jnp.stack(taps).reshape(kernel.shape).astype(kernel.dtype)
    dbias = jnp.sum(gz_f, axis=(0, 1, 2)).astype(bias.dtype)
    return dx.astype(x.dtype), dk, dbias


_dwconv3x3_shifts_cvjp.defvjp(_shifts_cvjp_fwd, _shifts_cvjp_bwd)


def _dwconv3x3_xla(x, kernel, bias, gelu: bool = False):
    c = x.shape[-1]
    out = jax.lax.conv_general_dilated(
        x,
        kernel.astype(x.dtype),
        window_strides=(1, 1),
        padding=[(1, 1), (1, 1)],
        feature_group_count=c,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    out = out + bias.astype(out.dtype)
    if gelu:
        out = jax.nn.gelu(out, approximate=False)
    return out


def dwconv3x3(x, kernel, bias, gelu: bool = False, force: str | None = None,
              train: bool = False):
    """force: None (auto) | 'pallas' | 'xla' | 'shifts' | 'shifts-cvjp' | 'interpret'.

    Auto policy (measured on v5e at CFFM-B1 geometry): inference on TPU uses
    the 'shifts' formulation — one XLA loop fusion, ~1.8× faster than the
    conv emitter in-model (which picks hostile layouts and splits off the
    GELU) and faster end-to-end than the Pallas kernel (whose pallas_call
    boundaries force layout copies). Training on TPU uses 'shifts-cvjp':
    the same three clean 9-tap passes with a hand-written VJP — measured
    174 ms for the B=8 480² train step where the conv emitter's depthwise
    backward now lowers pathologically (8.6 s/step, reproduced twice; it
    had measured 163 ms under an earlier toolchain, so the emitter path
    is environment-sensitive in a way the explicit formulation is not).
    Off-TPU keeps the plain conv (CPU conv backward is fine and the 9-tap
    unrolled graph is slower to compile there).
    """
    if force == "interpret":
        return _dwconv3x3_pallas(x, kernel, bias, gelu, interpret=True)
    if force == "xla":
        return _dwconv3x3_xla(x, kernel, bias, gelu)
    if force == "shifts":
        return _dwconv3x3_shifts(x, kernel, bias, gelu)
    if force == "shifts-cvjp":
        return _dwconv3x3_shifts_cvjp(x, kernel, bias, gelu)
    if force == "pallas":
        return _dwconv3x3_pallas(x, kernel, bias, gelu)
    platform = jax.devices()[0].platform
    if platform in ("tpu", "axon"):
        if train:
            return _dwconv3x3_shifts_cvjp(x, kernel, bias, gelu)
        return _dwconv3x3_shifts(x, kernel, bias, gelu)
    return _dwconv3x3_xla(x, kernel, bias, gelu)
