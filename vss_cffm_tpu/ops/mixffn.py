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

``mixffn_fused``/``block_ffn_fused`` carry no VJP; training is served by
the differentiable ``block_ffn_train`` pair at the bottom of this file
(round 5) or the full-block pair in ``ops/stage_block.py``. Numerics: the
unfused bf16 path rounds the hidden to bf16 between fc1/dwconv/fc2; here
taps accumulate from the f32 matmul result (strictly more accurate), and
the fc2 input is rounded to the compute dtype once after GELU.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .dwconv import _erf, _gelu_exact

__all__ = ["mixffn_fused", "mixffn_xla", "block_ffn_fused", "block_ffn_xla",
           "block_ffn_train", "block_ffn_train_xla", "block_ffn_train_fits"]


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
               b2_ref, *rest, th: int, h: int, w: int, eps: float,
               with_scale: bool = False):
    """``out = x + s·FFN(LN(x))`` per (batch, row tile) — the whole second
    half of a MiT block in one VMEM-resident pass. Same structure as
    ``_kernel`` with the pre-FFN LayerNorm computed in-register (f32 stats
    over C) and the residual added before the write, so the LN'd map and the
    FFN output never touch HBM. ``with_scale`` threads a per-sample branch
    scale (stochastic-depth keep mask / (1−p)) — the inference path omits
    the operand entirely, so its HLO is unchanged."""
    if with_scale:
        s_ref, o_ref = rest
    else:
        (o_ref,) = rest
    t = pl.program_id(1)
    bi = pl.program_id(0)
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
    if with_scale:
        out = out * s_ref[bi, 0]  # (B, 1) SMEM vector, per-sample scale
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


# ---------------------------------------------------------------------------
# differentiable fused block-FFN (training path)
# ---------------------------------------------------------------------------
#
# The round-5 train profile put the composed FFN families (shifts-cvjp taps,
# dk reduces, fc1/fc2 fusions and their LN epilogues) at ~42 ms of the
# 171 ms B=8 480² step. This pair of kernels serves the whole block half
# x + s·FFN(LN(x)) in training: the forward is the inference megakernel
# with a per-sample branch scale (stochastic depth); the backward recomputes
# every intermediate from x in VMEM (flash-style — nothing hid-sized is
# saved) and emits dx plus all eight parameter gradients, with the weight
# gradients accumulated across the sequential TPU grid into revisited
# f32 output blocks (same pattern as the CFM backward's dbias).


# Scoped-VMEM ceiling requested from Mosaic for the backward kernel (the
# 16 MB default is a compiler default, not the hardware: v5e has 128 MB).
# A roomier stack buys a larger row tile, and the ±(2,3)-row halo recompute
# amortizes as (th+5)/th.
_BWD_VMEM_LIMIT = 64 << 20


def _pick_th_train(h: int, wp: int, c: int, ch: int, dt_bytes: int,
                   vmem_limit: int = _BWD_VMEM_LIMIT - (4 << 20)):
    """Largest divisor of H whose backward-kernel live set fits the scoped
    VMEM stack.

    The tile model enumerates the six Ch-sized f32 slabs (hid, z/acc, d_a,
    d_z, gelu-grad temp, dh_acc) and the C-sized slabs; Mosaic's measured
    stack was 2.26× the enumerated tile at stage-1 th=6 (22.56 MB vs
    12.5 MB modeled — the unrolled tap loops keep roll temporaries live),
    so the model applies a 2.3× liveness factor on the tile."""
    fixed = ((h + 5) * wp * c * dt_bytes      # x frame block
             + (h + 3) * wp * c * dt_bytes    # go frame block
             + 2 * c * ch * (dt_bytes + 4)    # w1/w2 + dw1/dw2 accumulators
             + 9 * ch * 8)
    best = None
    for th in range(1, h + 1):
        if h % th:
            continue
        tile = ((th + 5) * wp * ch * 4            # hid
                + 4 * (th + 3) * wp * ch * 4      # z / d_a / d_z / gelu-grad
                + th * wp * ch * 4                # dh_acc
                + 3 * (th + 5) * wp * c * 4)      # xs / ln / d_ln-sized
        if fixed + int(2.3 * tile) <= vmem_limit:
            best = th
    return best


def _bwd_kernel_ln(x_ref, go_ref, g_ref, be_ref, w1_ref, b1_ref, wk_ref,
                   bdw_ref, w2_ref, s_ref,
                   dx_ref, dg_ref, dbe_ref, dw1_ref, db1_ref, dk_ref,
                   dbdw_ref, dw2_ref, db2_ref,
                   *, th: int, h: int, w: int, eps: float):
    """Backward of ``out = x + s·FFN(LN(x))`` per (batch, row-tile).

    Row coordinate plan (slab row → real row): the x block is padded 2
    top / 3 bottom so the tile's x slab [t·th, t·th+th+5) covers real rows
    t·th−2 … t·th+th+2 (hid needs ±2 because d_hid row r pulls d_z rows
    r−1…r+1, which pull z/hid rows r−2…r+2); the go block is padded 1 top /
    2 bottom so its slab covers real rows t·th−1 … t·th+th+1 (the d_z rows).
    Columns keep the forward's 1-left-pad convention; values aligned to real
    columns (z, go, dx) are reached with single sublane rolls.
    """
    bi = pl.program_id(0)
    t = pl.program_id(1)
    wp = x_ref.shape[2]
    f32 = jnp.float32
    cdt = w1_ref.dtype
    sc = s_ref[bi, 0]  # (B, 1) SMEM vector

    gamma = g_ref[0].astype(f32)
    beta = be_ref[0].astype(f32)
    w1 = w1_ref[:]
    b1 = b1_ref[0]
    wk = wk_ref[:]
    bdw = bdw_ref[0]
    w2 = w2_ref[:]
    chh = w1.shape[1]

    xs = x_ref[0, pl.ds(t * th, th + 5)].astype(f32)   # real rows t·th−2 …
    gs = go_ref[0, pl.ds(t * th, th + 3)].astype(f32)  # real rows t·th−1 …

    # ---- forward recompute (f32 stats, compute-dtype matmul inputs) ----
    mu = jnp.mean(xs, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xs - mu), axis=-1, keepdims=True)
    rsig = jax.lax.rsqrt(var + eps)
    xhat = (xs - mu) * rsig
    ln = (xhat * gamma + beta).astype(cdt)  # (th+5, wp, C)

    hid = jax.lax.dot_general(
        ln, w1, dimension_numbers=(((2,), (0,)), ((), ())),
        preferred_element_type=f32) + b1  # (th+5, wp, Ch)
    rg = t * th - 2 + jax.lax.broadcasted_iota(jnp.int32, (th + 5, wp, 1), 0)
    colx = jax.lax.broadcasted_iota(jnp.int32, (th + 5, wp, 1), 1)
    hid = jnp.where((rg >= 0) & (rg < h) & (colx >= 1) & (colx < w + 1),
                    hid, 0.0)

    acc = jnp.zeros((th + 3, wp, chh), f32)
    for dj in range(3):
        sh = hid if dj == 0 else pltpu.roll(hid, wp - dj, 1)
        for di in range(3):
            acc = acc + sh[di : di + th + 3] * wk[di, dj]
    z = acc + bdw  # (th+3, wp, Ch), col c = real col c

    # ---- backward ----
    go_a = pltpu.roll(gs, wp - 1, 1)        # col c = real col c
    go_s = (go_a * sc).astype(cdt)          # FFN-branch cotangent
    d_a = jax.lax.dot_general(
        go_s, w2, dimension_numbers=(((2,), (1,)), ((), ())),
        preferred_element_type=f32)  # (th+3, wp, Ch)
    phi = jnp.exp(-0.5 * z * z) * 0.3989422804014327
    big = 0.5 * (1.0 + _erf(z * 0.7071067811865476))
    d_z = d_a * (big + z * phi)
    a_act = _gelu_exact(z).astype(cdt)

    # d_hid (tile-own rows, hid column convention: col c = real col c−1)
    dh_acc = jnp.zeros((th, wp, chh), f32)
    for dj in range(3):
        sh = d_z if dj == 0 else pltpu.roll(d_z, dj, 1)  # [c] = d_z[c−dj]
        for di in range(3):
            dh_acc = dh_acc + sh[2 - di : 2 - di + th] * wk[di, dj]
    colv = jax.lax.broadcasted_iota(jnp.int32, (th, wp, 1), 1)
    d_hid = jnp.where((colv >= 1) & (colv < w + 1), dh_acc, 0.0)

    d_hid_b = d_hid.astype(cdt)
    d_ln = jax.lax.dot_general(
        d_hid_b, w1, dimension_numbers=(((2,), (1,)), ((), ())),
        preferred_element_type=f32)  # (th, wp, C)

    xhat_t = xhat[2 : 2 + th]
    dly = d_ln * gamma
    mean1 = jnp.mean(dly, axis=-1, keepdims=True)
    mean2 = jnp.mean(dly * xhat_t, axis=-1, keepdims=True)
    dx_ln = rsig[2 : 2 + th] * (dly - mean1 - xhat_t * mean2)
    dx_tile = go_a[1 : th + 1] + pltpu.roll(dx_ln, wp - 1, 1)
    dx_ref[0] = dx_tile[:, :w].astype(dx_ref.dtype)

    # ---- parameter gradients (tile partials → sequential accumulation) ----
    ln_own = ln[2 : 2 + th]
    a_own = a_act[1 : th + 1]
    go_own_s = go_s[1 : th + 1]
    dz_own = d_z[1 : th + 1]
    dw2_p = jax.lax.dot_general(
        a_own.reshape(th * wp, chh), go_own_s.reshape(th * wp, -1),
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=f32)  # (Ch, C)
    dw1_p = jax.lax.dot_general(
        ln_own.reshape(th * wp, -1), d_hid_b.reshape(th * wp, chh),
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=f32)  # (C, Ch)
    db2_p = jnp.sum(go_a[1 : th + 1], axis=(0, 1)) * sc
    db1_p = jnp.sum(d_hid, axis=(0, 1))
    dg_p = jnp.sum(d_ln * xhat_t, axis=(0, 1))
    dbe_p = jnp.sum(d_ln, axis=(0, 1))
    dbdw_p = jnp.sum(dz_own, axis=(0, 1))
    taps = []
    for di in range(3):
        row_taps = []
        for dj in range(3):
            sh = hid if dj == 0 else pltpu.roll(hid, wp - dj, 1)
            row_taps.append(jnp.sum(sh[1 + di : 1 + di + th] * dz_own,
                                    axis=(0, 1)))
        taps.append(jnp.stack(row_taps))
    dk_p = jnp.stack(taps)  # (3, 3, Ch)

    first = (bi == 0) & (t == 0)

    @pl.when(first)
    def _():
        dg_ref[0] = dg_p
        dbe_ref[0] = dbe_p
        dw1_ref[...] = dw1_p
        db1_ref[0] = db1_p
        dk_ref[...] = dk_p
        dbdw_ref[0] = dbdw_p
        dw2_ref[...] = dw2_p
        db2_ref[0] = db2_p

    @pl.when(jnp.logical_not(first))
    def _():
        dg_ref[0] = dg_ref[0] + dg_p
        dbe_ref[0] = dbe_ref[0] + dbe_p
        dw1_ref[...] = dw1_ref[...] + dw1_p
        db1_ref[0] = db1_ref[0] + db1_p
        dk_ref[...] = dk_ref[...] + dk_p
        dbdw_ref[0] = dbdw_ref[0] + dbdw_p
        dw2_ref[...] = dw2_ref[...] + dw2_p
        db2_ref[0] = db2_ref[0] + db2_p


@functools.partial(jax.jit, static_argnames=("eps", "interpret"))
def _block_ffn_fwd_scaled(x, gamma, beta, w1, b1, kdw, bdw, w2, b2, scale,
                          eps: float = 1e-6, interpret: bool = False):
    """Forward of the train path: ``x + scale_b·FFN(LN(x))`` (the inference
    kernel plus a per-sample branch-scale operand)."""
    b, h, w, c = x.shape
    ch = w1.shape[1]
    wp = -(-(w + 2) // 8) * 8
    th = _pick_th(h, wp, ch)
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, wp - w - 1), (0, 0)))
    dt = x.dtype
    fix = lambda i, t: (0, 0)
    return pl.pallas_call(
        functools.partial(_kernel_ln, th=th, h=h, w=w, eps=eps,
                          with_scale=True),
        out_shape=jax.ShapeDtypeStruct((b, h, w, c), dt),
        grid=(b, h // th),
        in_specs=[
            pl.BlockSpec((1, h + 2, wp, c), lambda i, t: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), fix, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), fix, memory_space=pltpu.VMEM),
            pl.BlockSpec((c, ch), fix, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ch), fix, memory_space=pltpu.VMEM),
            pl.BlockSpec((3, 3, ch), lambda i, t: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ch), fix, memory_space=pltpu.VMEM),
            pl.BlockSpec((ch, c), fix, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), fix, memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
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
        scale.astype(jnp.float32).reshape(b, 1),
    )


@functools.partial(jax.jit, static_argnames=("eps", "interpret"))
def _block_ffn_bwd_pallas(x, gamma, beta, w1, b1, kdw, bdw, w2, scale, go,
                          eps: float = 1e-6, interpret: bool = False):
    b, h, w, c = x.shape
    ch = w1.shape[1]
    wp = -(-(w + 2) // 8) * 8
    dt = x.dtype
    th = _pick_th_train(h, wp, c, ch, dt.itemsize)
    if th is None:
        raise ValueError("block-FFN backward does not fit VMEM at this "
                         "geometry")  # callers gate via block_ffn_train_fits
    xp = jnp.pad(x, ((0, 0), (2, 3), (1, wp - w - 1), (0, 0)))
    gp = jnp.pad(go, ((0, 0), (1, 2), (1, wp - w - 1), (0, 0)))
    fix = lambda i, t: (0, 0)
    outs = pl.pallas_call(
        functools.partial(_bwd_kernel_ln, th=th, h=h, w=w, eps=eps),
        out_shape=(
            jax.ShapeDtypeStruct((b, h, w, c), dt),       # dx
            jax.ShapeDtypeStruct((1, c), jnp.float32),    # dgamma
            jax.ShapeDtypeStruct((1, c), jnp.float32),    # dbeta
            jax.ShapeDtypeStruct((c, ch), jnp.float32),   # dw1
            jax.ShapeDtypeStruct((1, ch), jnp.float32),   # db1
            jax.ShapeDtypeStruct((3, 3, ch), jnp.float32),  # dkdw
            jax.ShapeDtypeStruct((1, ch), jnp.float32),   # dbdw
            jax.ShapeDtypeStruct((ch, c), jnp.float32),   # dw2
            jax.ShapeDtypeStruct((1, c), jnp.float32),    # db2
        ),
        grid=(b, h // th),
        in_specs=[
            pl.BlockSpec((1, h + 5, wp, c), lambda i, t: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, h + 3, wp, c), lambda i, t: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), fix, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), fix, memory_space=pltpu.VMEM),
            pl.BlockSpec((c, ch), fix, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ch), fix, memory_space=pltpu.VMEM),
            pl.BlockSpec((3, 3, ch), lambda i, t: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ch), fix, memory_space=pltpu.VMEM),
            pl.BlockSpec((ch, c), fix, memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, th, w, c), lambda i, t: (i, t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), fix, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), fix, memory_space=pltpu.VMEM),
            pl.BlockSpec((c, ch), fix, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ch), fix, memory_space=pltpu.VMEM),
            pl.BlockSpec((3, 3, ch), lambda i, t: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ch), fix, memory_space=pltpu.VMEM),
            pl.BlockSpec((ch, c), fix, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), fix, memory_space=pltpu.VMEM),
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_BWD_VMEM_LIMIT),
        interpret=interpret,
    )(
        xp,
        gp,
        gamma.astype(jnp.float32).reshape(1, c),
        beta.astype(jnp.float32).reshape(1, c),
        w1.astype(dt),
        b1.astype(jnp.float32).reshape(1, ch),
        kdw.reshape(3, 3, ch).astype(jnp.float32),
        bdw.astype(jnp.float32).reshape(1, ch),
        w2.astype(dt),
        scale.astype(jnp.float32).reshape(b, 1),
    )
    (dx, dg, dbe, dw1, db1, dkdw, dbdw, dw2, db2) = outs
    return (dx, dg[0], dbe[0], dw1, db1[0], dkdw.reshape(3, 3, 1, ch),
            dbdw[0], dw2, db2[0])


def block_ffn_train_fits(h: int, w: int, c: int, ch: int,
                         dt_bytes: int = 2) -> bool:
    """True when the backward kernel's VMEM model admits this geometry."""
    wp = -(-(w + 2) // 8) * 8
    return _pick_th_train(h, wp, c, ch, dt_bytes) is not None


@functools.partial(jax.custom_vjp, nondiff_argnums=(10, 11))
def block_ffn_train(x, gamma, beta, w1, b1, kdw, bdw, w2, b2, scale,
                    eps: float = 1e-6, interpret: bool = False):
    """Differentiable fused block-FFN: ``x + scale_b·FFN(LN(x))``.

    ``scale`` (B,) is the per-sample stochastic-depth branch scale (1.0, or
    Bernoulli(keep)/keep at train); it is treated as non-differentiable.
    Forward = the inference megakernel + scale; backward = one Pallas kernel
    recomputing the forward from x in VMEM and emitting dx + all parameter
    gradients (f32, accumulated across the sequential grid).
    """
    return _block_ffn_fwd_scaled(x, gamma, beta, w1, b1, kdw, bdw, w2, b2,
                                 scale, eps, interpret)


def _bft_fwd(x, gamma, beta, w1, b1, kdw, bdw, w2, b2, scale, eps, interpret):
    out = _block_ffn_fwd_scaled(x, gamma, beta, w1, b1, kdw, bdw, w2, b2,
                                scale, eps, interpret)
    return out, (x, gamma, beta, w1, b1, kdw, bdw, w2, scale)


def _bft_bwd(eps, interpret, res, g):
    x, gamma, beta, w1, b1, kdw, bdw, w2, scale = res
    dx, dg, dbe, dw1, db1, dkdw, dbdw, dw2, db2 = _block_ffn_bwd_pallas(
        x, gamma, beta, w1, b1, kdw, bdw, w2, scale, g, eps, interpret)
    return (dx, dg.astype(gamma.dtype), dbe.astype(beta.dtype),
            dw1.astype(w1.dtype), db1.astype(b1.dtype),
            dkdw.astype(kdw.dtype), dbdw.astype(bdw.dtype),
            dw2.astype(w2.dtype), db2.astype(b1.dtype),
            jnp.zeros_like(scale))


block_ffn_train.defvjp(_bft_fwd, _bft_bwd)


def block_ffn_train_xla(x, gamma, beta, w1, b1, kdw, bdw, w2, b2, scale,
                        eps: float = 1e-6):
    """Identical-math XLA composition of ``block_ffn_train`` (oracle)."""
    branch = mixffn_xla(
        _ln_xla(x, gamma, beta, eps).astype(x.dtype),
        w1, b1, kdw, bdw, w2, b2).astype(jnp.float32)
    s = scale.astype(jnp.float32)[:, None, None, None]
    return (x.astype(jnp.float32) + s * branch).astype(x.dtype)


def _ln_xla(x, gamma, beta, eps):
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mu), axis=-1, keepdims=True)
    return ((xf - mu) * jax.lax.rsqrt(var + eps) * gamma.astype(jnp.float32)
            + beta.astype(jnp.float32))


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
