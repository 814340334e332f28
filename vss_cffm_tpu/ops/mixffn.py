"""Fully-fused MixFFN (fc1 → 3×3 depthwise conv → GELU → fc2) — Pallas TPU.

The backbone MixFFN (reference ``mix_transformer.py:224-252`` ``Mlp`` +
``:358-369`` ``DWConv``) expands C → 4C, mixes 3×3 depthwise, GELUs and
projects back. Under XLA (round-2 'shifts' formulation) the hidden (B, H,
W, 4C) tensor makes three HBM round-trips — fc1 write, 9 shifted tap reads,
fc2 read — ≈ 11× the traffic of the input itself; the builder's round-2
profile put the stage-1 instance at the top of the remaining forward cost.

This kernel computes the whole FFN per (batch, row-slab) with the hidden
state resident in VMEM:

    HBM traffic = read x (B,H,W,C) + write y (B,H,W,C) + weights — nothing
    else. The (th+2, Wp, 4C) hidden slab is produced by an MXU matmul,
    tap-accumulated in f32 with sublane rolls (W shifts) and row slices
    (H shifts), GELU'd in-register, and immediately contracted by the fc2
    matmul.

Row halos (±1): the whole padded input image of one batch element sits in
VMEM (its block index ignores the row-tile grid axis, so Mosaic keeps it
resident across tiles) and each tile slices its (th+2)-row window from it —
BlockSpecs cannot express overlapping tiles, a resident block can. The
zero-padding of the *hidden* map (conv pads the dwconv input, i.e. the fc1
*output*) is reproduced by masking the matmul+bias result to zero outside
the valid (row, col) window — a padded input column would otherwise read
``b1``.

Inference-only (no VJP): training keeps the unfused conv path (see
``models/mit.MixFFN``). Numerics: the unfused bf16 path rounds the hidden
to bf16 between fc1/dwconv/fc2; here taps accumulate from the f32 matmul
result (strictly more accurate), and the fc2 input is rounded to the
compute dtype once after GELU.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .dwconv import _gelu_exact

__all__ = ["mixffn_fused", "mixffn_xla", "block_ffn_fused", "block_ffn_xla"]


def _pick_th(h: int, wp: int, ch: int, budget_bytes: int = 4 << 20) -> int:
    """Largest divisor of H whose f32 hidden slab (th+2, wp, ch) plus tap
    accumulator (th, wp, ch) fit the VMEM budget (the two biggest per-tile
    buffers; the input/output blocks and weights are budgeted separately)."""
    best = 1
    for th in range(1, h + 1):
        if h % th == 0 and (2 * th + 2) * wp * ch * 4 <= budget_bytes:
            best = th
    return best


def _kernel(x_ref, w1_ref, b1_ref, wk_ref, bdw_ref, w2_ref, b2_ref, o_ref,
            *, th: int, h: int, w: int):
    """One program = one (batch, row tile). The padded input block is indexed
    by batch only, so Mosaic keeps it VMEM-resident across the row tiles of
    a batch (no re-fetch when the index map is unchanged)."""
    t = pl.program_id(1)
    wp = x_ref.shape[2]
    w1 = w1_ref[:]          # (C, Ch) compute dtype
    b1 = b1_ref[0]          # (Ch,) f32
    wk = wk_ref[:]          # (3, 3, Ch) f32
    bdw = bdw_ref[0]        # (Ch,) f32
    w2 = w2_ref[:]          # (Ch, C) compute dtype
    b2 = b2_ref[0]          # (C,) f32

    x = x_ref[0, pl.ds(t * th, th + 2)]  # (th+2, wp, C), rows overlap ±1
    # fc1 on the MXU; hidden stays f32 for the tap accumulation (Mosaic
    # sublane rolls need 32-bit data anyway)
    hid = jax.lax.dot_general(
        x, w1, dimension_numbers=(((2,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + b1  # (th+2, wp, Ch)
    # zero the conv padding ring: global padded rows 0 and h+1, cols outside
    # [1, w+1) — the matmul put b1 there, the conv wants 0. Masks are built
    # rank-3 directly — Mosaic cannot reshape a bool (r, c) → (r, c, 1)
    row_g = t * th + jax.lax.broadcasted_iota(jnp.int32, (th + 2, wp, 1), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (th + 2, wp, 1), 1)
    valid = (row_g >= 1) & (row_g < h + 1) & (col >= 1) & (col < w + 1)
    hid = jnp.where(valid, hid, 0.0)

    # 9 taps: W shifts as sublane rolls (wrap-around lands in zeroed
    # columns), H shifts as row slices — all layout-aligned
    acc = jnp.zeros((th, wp, hid.shape[-1]), jnp.float32)
    for dj in range(3):
        shifted = hid if dj == 0 else pltpu.roll(hid, wp - dj, 1)
        for di in range(3):
            acc = acc + shifted[di : di + th] * wk[di, dj]
    acc = _gelu_exact(acc + bdw).astype(w2.dtype)
    out = jax.lax.dot_general(
        acc, w2, dimension_numbers=(((2,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + b2  # (th, wp, C)
    o_ref[0] = out[:, :w].astype(o_ref.dtype)


def _kernel_ln(x_ref, g_ref, be_ref, w1_ref, b1_ref, wk_ref, bdw_ref, w2_ref,
               b2_ref, o_ref, *, th: int, h: int, w: int, eps: float):
    """``out = x + FFN(LN(x))`` per (batch, row tile) — the whole second half
    of a MiT block in one VMEM-resident pass. Same structure as ``_kernel``
    with the pre-FFN LayerNorm computed in-register (f32 stats over C) and
    the residual added before the write, so the LN'd map and the FFN output
    never touch HBM."""
    t = pl.program_id(1)
    wp = x_ref.shape[2]
    gamma = g_ref[0]        # (C,) f32
    beta = be_ref[0]        # (C,) f32
    w1 = w1_ref[:]
    b1 = b1_ref[0]
    wk = wk_ref[:]
    bdw = bdw_ref[0]
    w2 = w2_ref[:]
    b2 = b2_ref[0]

    x = x_ref[0, pl.ds(t * th, th + 2)]  # (th+2, wp, C) rows overlap ±1
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mu), axis=-1, keepdims=True)
    ln = ((xf - mu) * jax.lax.rsqrt(var + eps) * gamma + beta).astype(w1.dtype)

    hid = jax.lax.dot_general(
        ln, w1, dimension_numbers=(((2,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + b1  # (th+2, wp, Ch)
    row_g = t * th + jax.lax.broadcasted_iota(jnp.int32, (th + 2, wp, 1), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (th + 2, wp, 1), 1)
    valid = (row_g >= 1) & (row_g < h + 1) & (col >= 1) & (col < w + 1)
    hid = jnp.where(valid, hid, 0.0)

    acc = jnp.zeros((th, wp, hid.shape[-1]), jnp.float32)
    for dj in range(3):
        shifted = hid if dj == 0 else pltpu.roll(hid, wp - dj, 1)
        for di in range(3):
            acc = acc + shifted[di : di + th] * wk[di, dj]
    acc = _gelu_exact(acc + bdw).astype(w2.dtype)
    out = jax.lax.dot_general(
        acc, w2, dimension_numbers=(((2,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + b2  # (th, wp, C)
    # residual: x slab col c ↔ real col c−1; align with a sublane roll
    res = pltpu.roll(xf, wp - 1, 1)[1 : th + 1]  # (th, wp, C), col j = real j
    o_ref[0] = (out + res)[:, :w].astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("eps", "interpret"))
def block_ffn_fused(x, gamma, beta, w1, b1, kdw, bdw, w2, b2,
                    eps: float = 1e-6, interpret: bool = False):
    """x (B, H, W, C) → x + (GELU(dwconv3x3(LN(x) @ w1 + b1) + bdw) @ w2 + b2).

    The fused form of a MiT block's second half (LN2 + MixFFN + residual,
    reference ``mix_transformer.py:120-157``): one HBM read of x, one write
    of the block output. LN statistics are f32 in-register (the unfused bf16
    path rounds the normalized map — strictly less accurate)."""
    b, h, w, c = x.shape
    ch = w1.shape[1]
    wp = -(-(w + 2) // 8) * 8
    th = _pick_th(h, wp, ch)
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, wp - w - 1), (0, 0)))
    dt = x.dtype
    return pl.pallas_call(
        functools.partial(_kernel_ln, th=th, h=h, w=w, eps=eps),
        out_shape=jax.ShapeDtypeStruct((b, h, w, c), dt),
        grid=(b, h // th),
        in_specs=[
            pl.BlockSpec((1, h + 2, wp, c), lambda i, t: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i, t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i, t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((c, ch), lambda i, t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ch), lambda i, t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((3, 3, ch), lambda i, t: (0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ch), lambda i, t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((ch, c), lambda i, t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i, t: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, th, w, c), lambda i, t: (i, t, 0, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(
        xp,
        gamma.astype(jnp.float32).reshape(1, c),
        beta.astype(jnp.float32).reshape(1, c),
        w1.astype(dt),
        b1.astype(jnp.float32).reshape(1, ch),
        kdw.reshape(3, 3, ch).astype(jnp.float32),
        bdw.astype(jnp.float32).reshape(1, ch),
        w2.astype(dt),
        b2.astype(jnp.float32).reshape(1, c),
    )


def block_ffn_xla(x, gamma, beta, w1, b1, kdw, bdw, w2, b2, eps: float = 1e-6):
    """Identical-math XLA composition of ``block_ffn_fused`` (oracle)."""
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mu), axis=-1, keepdims=True)
    ln = ((xf - mu) * jax.lax.rsqrt(var + eps) * gamma.astype(jnp.float32)
          + beta.astype(jnp.float32)).astype(x.dtype)
    return (xf + mixffn_xla(ln, w1, b1, kdw, bdw, w2, b2).astype(jnp.float32)).astype(x.dtype)


@functools.partial(jax.jit, static_argnames=("interpret",))
def mixffn_fused(x, w1, b1, kdw, bdw, w2, b2, interpret: bool = False):
    """x (B, H, W, C) → GELU(dwconv3x3(x @ w1 + b1) + bdw) @ w2 + b2.

    kdw is the flax depthwise layout (3, 3, 1, Ch). Output (B, H, W, C) in
    ``x.dtype``; matmuls run in ``x.dtype`` on the MXU with f32 accumulation.
    """
    b, h, w, c = x.shape
    ch = w1.shape[1]
    wp = -(-(w + 2) // 8) * 8
    th = _pick_th(h, wp, ch)
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, wp - w - 1), (0, 0)))
    dt = x.dtype
    return pl.pallas_call(
        functools.partial(_kernel, th=th, h=h, w=w),
        out_shape=jax.ShapeDtypeStruct((b, h, w, c), dt),
        grid=(b, h // th),
        in_specs=[
            # whole padded image per batch: the index map ignores t, so the
            # block persists in VMEM across a batch's row tiles
            pl.BlockSpec((1, h + 2, wp, c), lambda i, t: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((c, ch), lambda i, t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ch), lambda i, t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((3, 3, ch), lambda i, t: (0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ch), lambda i, t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((ch, c), lambda i, t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i, t: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, th, w, c), lambda i, t: (i, t, 0, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(
        xp,
        w1.astype(dt),
        b1.astype(jnp.float32).reshape(1, ch),
        kdw.reshape(3, 3, ch).astype(jnp.float32),
        bdw.astype(jnp.float32).reshape(1, ch),
        w2.astype(dt),
        b2.astype(jnp.float32).reshape(1, c),
    )


def mixffn_xla(x, w1, b1, kdw, bdw, w2, b2):
    """Identical-math XLA composition (CPU fallback / kernel test oracle):
    f32 hidden through the taps, one rounding before fc2 — matching the
    kernel's dtype plan exactly."""
    dt = x.dtype
    hid = jax.lax.dot_general(
        x, w1.astype(dt), dimension_numbers=(((3,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + b1.astype(jnp.float32)
    b, h, w, ch = hid.shape
    k = kdw.reshape(3, 3, ch).astype(jnp.float32)
    hp = jnp.pad(hid, ((0, 0), (1, 1), (1, 1), (0, 0)))
    acc = None
    for di in range(3):
        for dj in range(3):
            term = hp[:, di : di + h, dj : dj + w, :] * k[di, dj]
            acc = term if acc is None else acc + term
    acc = _gelu_exact(acc + bdw.astype(jnp.float32)).astype(dt)
    out = jax.lax.dot_general(
        acc, w2.astype(dt), dimension_numbers=(((3,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + b2.astype(jnp.float32)
    return out.astype(dt)
