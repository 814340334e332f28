"""Fully-fused MiT block (LN1 → SRA attention → +res → LN2 → MixFFN → +res)
— Pallas TPU, single-head stages.

Motivation (round-3 profile, see DEVELOPMENT.md "Backbone emitter
analysis"): at CFFM-B1 480² the stage-1 blocks cost 1.006 ms of the 3.98 ms
forward because XLA canonicalizes the block's dots to 1×1 convolutions and
serves them with a spatial-in-lanes conv emitter at ~130 GB/s (C=64 < 128
lanes drives W-in-lanes layouts). Formulation nudges measured end-to-end
neutral; the only way out is to keep the whole block away from XLA's layout
assignment.

This kernel computes one full transformer block (reference ``Block``,
``mmseg/models/backbones/mix_transformer.py:120-157``) per (frame,
row-tile) with every intermediate VMEM-resident:

    HBM traffic = read x + write y + weights + the (S, C) K/V per frame.

The spatial-reduction K/V path (``Attention`` ``:96-117``: stride-8 pooling
→ LayerNorm → kv dense) runs XLA-side — it touches S = ⌈H/8⌉·⌈W/8⌉ ≈ 225
tokens per frame, is cheap there, and doing its (H,W,C)→(S,64·C) reshapes
in-kernel is exactly the Mosaic shape-cast territory that sank the in-kernel
CFM K/V assembly. The attention scale is folded into Kᵀ XLA-side (one less
VPU pass; numerically identical contraction in f32).

Multi-head (stages 2-4) runs as a static in-kernel loop over head-major
weight stacks ((nh, C, dh) q / (nh, dh, C) proj, per-head (dh, S) Kᵀ):
dh = 64 < the 128-lane tile, so per-head slicing happens in the *weight
restack* XLA-side, never on the lane dim in-kernel; the output projection
accumulates per head (Σ_h ctx_h @ Wproj[h] ≡ concat(ctx) @ Wproj).

Row halos (±1, for the MixFFN dwconv) use the resident whole-frame block +
overlapping ``pl.ds`` row windows, exactly like ``ops/mixffn.block_ffn_fused``;
attention is recomputed for the two halo rows (S-token K/V makes that cheap).

Numerics: LN statistics and all residual adds are f32 in-register; matmul
inputs round to the compute dtype (bf16) like the unfused path's Dense
boundaries. The unfused path additionally rounds the attention scores and
the LN outputs to bf16 between ops — the kernel is strictly more accurate
there, so parity tests use bf16-scale tolerances (same policy as
``block_ffn_fused``). Inference-only (no VJP): training keeps the unfused
composition.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .dwconv import _gelu_exact

__all__ = ["mit_block_fused", "mit_block_xla"]


def _pick_th(h: int, w: int, wp: int, c: int, ch: int, nh: int, dh: int,
             sp: int, dt_bytes: int, tile_budget: int = 6 << 20,
             vmem_limit: int = 16 << 20):
    """Row-tile height: largest divisor of H whose two big f32 per-tile
    buffers ((th+2, wp, S) attention scores and (th+2, wp, Ch) hidden slab)
    fit ``tile_budget`` AND whose full footprint fits Mosaic's 16 MB scoped
    VMEM stack; ``None`` if even th=1 does not fit (caller falls back to the
    XLA composition).

    The footprint model: fixed residents (padded frame block, Kᵀ/V stacks,
    weight blocks) + 2× the f32 tile buffers (each has a live sibling —
    scores/probs, hidden/shifted — matching the observed Mosaic stack:
    25.05 MB measured at stage-2 th=60 vs 25.4 MB modeled) + the output
    tile."""
    fixed = (
        (h + 2) * wp * c * dt_bytes        # padded frame block (t-invariant)
        + 2 * nh * dh * sp * dt_bytes      # Kᵀ and V stacks
        + 2 * nh * c * dh * dt_bytes       # wq / wproj head stacks
        + 2 * c * ch * dt_bytes            # w1 / w2
        + 9 * ch * 4                       # dwconv taps (f32)
    )
    best = None
    for th in range(1, h + 1):
        if h % th:
            continue
        tile = (th + 2) * wp * (ch + sp) * 4
        total = fixed + 2 * tile + th * w * c * dt_bytes
        if tile <= tile_budget and total <= vmem_limit:
            best = th
    return best


def _ln_f32(xf, gamma, beta, eps):
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mu), axis=-1, keepdims=True)
    return (xf - mu) * jax.lax.rsqrt(var + eps) * gamma + beta


def _dot3(a, b):
    """(r, w, K) @ (K, N) → (r, w, N), f32 accumulation on the MXU."""
    return jax.lax.dot_general(
        a, b, dimension_numbers=(((2,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


def _kernel(x_ref, g1_ref, be1_ref, wq_ref, bq_ref, kt_ref, v_ref, wp_ref,
            bp_ref, g2_ref, be2_ref, w1_ref, b1_ref, wk_ref, bdw_ref, w2_ref,
            b2_ref, o_ref, *, th: int, h: int, w: int, nkv: int, eps: float):
    t = pl.program_id(1)
    wp = x_ref.shape[2]
    cdt = wq_ref.dtype
    nh = wq_ref.shape[0]

    x = x_ref[0, pl.ds(t * th, th + 2)]       # (th+2, wp, C), rows overlap ±1
    xf = x.astype(jnp.float32)

    # ---- attention half: LN1 → per-head q → softmax(q·(s·Kᵀ)) @ V → proj ----
    # Heads run as a static loop over head-major weight stacks — no lane-dim
    # slicing (dh = 64 < the 128-lane tile); the output projection is
    # accumulated per head (ctx_h @ Wproj[h] summed ≡ concat(ctx) @ Wproj).
    ln1 = _ln_f32(xf, g1_ref[0], be1_ref[0], eps).astype(cdt)
    y = xf + bp_ref[0]
    for hh in range(nh):
        q = (_dot3(ln1, wq_ref[hh]) + bq_ref[hh]).astype(cdt)
        s = _dot3(q, kt_ref[0, hh])           # (th+2, wp, Sp) f32, scale in Kᵀ
        lane = jax.lax.broadcasted_iota(jnp.int32, s.shape, 2)
        s = jnp.where(lane < nkv, s, -1e30)   # zero-padded K/V tokens
        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s - m)
        p = (p / jnp.sum(p, axis=-1, keepdims=True)).astype(cdt)
        ctx = _dot3(p, v_ref[0, hh]).astype(cdt)  # (th+2, wp, dh)
        y = y + _dot3(ctx, wp_ref[hh])        # f32, slab coords

    # ---- FFN half: LN2 → fc1 → 3×3 dwconv → GELU → fc2 → +y ----
    ln2 = _ln_f32(y, g2_ref[0], be2_ref[0], eps).astype(cdt)
    hid = _dot3(ln2, w1_ref[:]) + b1_ref[0]   # (th+2, wp, Ch) f32
    row_g = t * th + jax.lax.broadcasted_iota(jnp.int32, (th + 2, wp, 1), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (th + 2, wp, 1), 1)
    valid = (row_g >= 1) & (row_g < h + 1) & (col >= 1) & (col < w + 1)
    hid = jnp.where(valid, hid, 0.0)
    wk = wk_ref[:]
    acc = jnp.zeros((th, wp, hid.shape[-1]), jnp.float32)
    for dj in range(3):
        shifted = hid if dj == 0 else pltpu.roll(hid, wp - dj, 1)
        for di in range(3):
            acc = acc + shifted[di : di + th] * wk[di, dj]
    acc = _gelu_exact(acc + bdw_ref[0]).astype(cdt)
    out = _dot3(acc, w2_ref[:]) + b2_ref[0]   # (th, wp, C), real col coords
    res = pltpu.roll(y, wp - 1, 1)[1 : th + 1]  # slab col j+1 → real col j
    o_ref[0] = (out + res)[:, :w].astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("num_heads", "eps", "interpret",
                                             "vmem_budget"))
def mit_block_fused(x, g1, be1, wq, bq, k, v, wproj, bproj, g2, be2,
                    w1, b1, kdw, bdw, w2, b2, num_heads: int = 1,
                    eps: float = 1e-6, interpret: bool = False,
                    vmem_budget: int = 6 << 20):
    """One MiT block, fused.

    x (B, H, W, C); k/v (B, S, C) — the spatial-reduced keys/values per
    frame, head-major over C (scale NOT yet applied; folded into Kᵀ here);
    dense kernels in flax layout ((in, out)); kdw (3, 3, 1, Ch). Weights are
    restacked head-major here ((nh, C, dh) / (nh, dh, C)) so the kernel loops
    heads without lane-dim slicing. Returns (B, H, W, C) in x.dtype.
    """
    b, h, w, c = x.shape
    ch = w1.shape[1]
    s = k.shape[1]
    nh = num_heads
    dh = c // nh
    sp = -(-s // 128) * 128
    wp = -(-(w + 2) // 8) * 8
    dt = x.dtype
    th = _pick_th(h, w, wp, c, ch, nh, dh, sp, dt.itemsize, vmem_budget)
    if th is None:
        # Even th=1 exceeds VMEM at this geometry — serve the block from the
        # identical-math XLA composition instead of risking a Mosaic OOM.
        return mit_block_xla(x, g1, be1, wq, bq, k, v, wproj, bproj, g2, be2,
                             w1, b1, kdw, bdw, w2, b2, num_heads=num_heads,
                             eps=eps)
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, wp - w - 1), (0, 0)))
    scale = float(dh) ** -0.5
    # (B, S, C) head-major → (B, nh, dh, S) Kᵀ stacks / (B, nh, S, dh) V
    kt = jnp.pad(
        (k * jnp.asarray(scale, k.dtype)).reshape(b, s, nh, dh).transpose(0, 2, 3, 1),
        ((0, 0), (0, 0), (0, 0), (0, sp - s)))
    vp = jnp.pad(v.reshape(b, s, nh, dh).transpose(0, 2, 1, 3),
                 ((0, 0), (0, 0), (0, sp - s), (0, 0)))
    wqh = wq.reshape(c, nh, dh).transpose(1, 0, 2)
    bqh = bq.astype(jnp.float32).reshape(nh, dh)
    wph = wproj.reshape(nh, dh, c)
    row = lambda a: a.astype(jnp.float32).reshape(1, -1)
    frame4 = lambda i, t: (i, 0, 0, 0)
    both = lambda i, t: (0, 0)
    three = lambda i, t: (0, 0, 0)
    return pl.pallas_call(
        functools.partial(_kernel, th=th, h=h, w=w, nkv=s, eps=eps),
        out_shape=jax.ShapeDtypeStruct((b, h, w, c), dt),
        grid=(b, h // th),
        in_specs=[
            # whole padded frame: index map ignores t → VMEM-resident per frame
            pl.BlockSpec((1, h + 2, wp, c), frame4, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), both, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), both, memory_space=pltpu.VMEM),
            pl.BlockSpec((nh, c, dh), three, memory_space=pltpu.VMEM),
            pl.BlockSpec((nh, dh), both, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nh, dh, sp), frame4, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nh, sp, dh), frame4, memory_space=pltpu.VMEM),
            pl.BlockSpec((nh, dh, c), three, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), both, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), both, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), both, memory_space=pltpu.VMEM),
            pl.BlockSpec((c, ch), both, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ch), both, memory_space=pltpu.VMEM),
            pl.BlockSpec((3, 3, ch), three, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ch), both, memory_space=pltpu.VMEM),
            pl.BlockSpec((ch, c), both, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), both, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, th, w, c), lambda i, t: (i, t, 0, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(
        xp, row(g1), row(be1), wqh.astype(dt), bqh, kt.astype(dt),
        vp.astype(dt), wph.astype(dt), row(bproj), row(g2), row(be2),
        w1.astype(dt), row(b1), kdw.reshape(3, 3, ch).astype(jnp.float32),
        row(bdw), w2.astype(dt), row(b2),
    )


def mit_block_xla(x, g1, be1, wq, bq, k, v, wproj, bproj, g2, be2,
                  w1, b1, kdw, bdw, w2, b2, num_heads: int = 1,
                  eps: float = 1e-6):
    """Identical-math XLA composition (CPU fallback / kernel test oracle):
    f32 LN stats and residual chain, compute-dtype matmul inputs with f32
    accumulation — the kernel's exact dtype plan."""
    dt = x.dtype
    c = x.shape[-1]
    nh, dh = num_heads, c // num_heads
    ns = k.shape[1]
    f32 = jnp.float32
    xf = x.astype(f32)
    ln1 = _ln_f32(xf, g1.astype(f32), be1.astype(f32), eps).astype(dt)
    q = (jnp.einsum("bhwc,cd->bhwd", ln1, wq.astype(dt),
                    preferred_element_type=f32) + bq.astype(f32)).astype(dt)
    scale = float(dh) ** -0.5
    qh = q.reshape(*q.shape[:3], nh, dh)
    kh = (k * jnp.asarray(scale, k.dtype)).astype(dt).reshape(-1, ns, nh, dh)
    vh = v.astype(dt).reshape(-1, ns, nh, dh)
    s = jnp.einsum("bhwnd,bsnd->bhwns", qh, kh, preferred_element_type=f32)
    p = jax.nn.softmax(s, axis=-1).astype(dt)
    ctx = jnp.einsum("bhwns,bsnd->bhwnd", p, vh,
                     preferred_element_type=f32).astype(dt)
    ctx = ctx.reshape(*q.shape[:3], c)
    ao = jnp.einsum("bhwc,cd->bhwd", ctx, wproj.astype(dt),
                    preferred_element_type=f32) + bproj.astype(f32)
    y = xf + ao  # f32, like the kernel
    ln2 = _ln_f32(y, g2.astype(f32), be2.astype(f32), eps).astype(dt)
    hid = jnp.einsum("bhwc,cd->bhwd", ln2, w1.astype(dt),
                     preferred_element_type=f32) + b1.astype(f32)
    b_, h_, w_, ch = hid.shape
    kk = kdw.reshape(3, 3, ch).astype(f32)
    hp = jnp.pad(hid, ((0, 0), (1, 1), (1, 1), (0, 0)))
    acc = None
    for di in range(3):
        for dj in range(3):
            term = hp[:, di : di + h_, dj : dj + w_, :] * kk[di, dj]
            acc = term if acc is None else acc + term
    acc = _gelu_exact(acc + bdw.astype(f32)).astype(dt)
    out = jnp.einsum("bhwc,cd->bhwd", acc, w2.astype(dt),
                     preferred_element_type=f32) + b2.astype(f32)
    return (out + y).astype(dt)
