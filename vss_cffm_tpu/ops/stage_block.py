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
``block_ffn_fused``). ``mit_block_fused`` itself carries no VJP; training
is served by the differentiable ``mit_block_train`` pair at the bottom of
this file (round 5).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .dwconv import _erf, _gelu_exact

__all__ = ["mit_block_fused", "mit_block_xla", "mit_block_train",
           "mit_block_train_xla", "mit_block_train_fits"]


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


# ---------------------------------------------------------------------------
# differentiable full-block training pair (round 5)
# ---------------------------------------------------------------------------
#
# The FFN-half training kernel (ops/mixffn.block_ffn_train) left the
# attention half composed; its backward families (q/kv/proj dots emitted as
# W-in-lanes convolutions at stage 1, softmax backward, head transposes)
# remained ~10 ms of the B=8 480² step. This pair serves the WHOLE block in
# training: forward = the inference megakernel plus per-sample
# stochastic-depth branch scales; backward = one Pallas kernel per (frame,
# row-tile) that recomputes LN1 → attention → y → LN2 → FFN from x in VMEM
# (the attention runs over the same per-frame (S, C) K/V refs as the
# forward; halo rows ±(2,3) as in the FFN-half backward) and emits dx plus
# every parameter gradient. dK/dV accumulate per frame across the row tiles
# of the sequential grid; weight gradients accumulate globally.

_TRAIN_VMEM_LIMIT = 90 << 20


def _pick_th_train_block(h: int, w: int, wp: int, c: int, ch: int, nh: int,
                         dh: int, sp: int, dt_bytes: int,
                         vmem_limit: int = _TRAIN_VMEM_LIMIT - (4 << 20)):
    """Largest divisor of H whose backward live set fits the scoped stack
    (the 2.26× measured liveness factor of the FFN-half kernel applies)."""
    fixed = ((h + 5) * wp * c * dt_bytes
             + (h + 3) * wp * c * dt_bytes
             + 2 * nh * dh * sp * (dt_bytes + 4)   # kt/v refs + dkt/dv accs
             + 2 * nh * c * dh * (dt_bytes + 4)    # wq/wproj + their grads
             + 2 * c * ch * (dt_bytes + 4)
             + 9 * ch * 8)
    best = None
    for th in range(1, h + 1):
        if h % th:
            continue
        tile = ((th + 5) * wp * ch * 4                 # hid
                + 4 * (th + 3) * wp * ch * 4           # z/d_a/d_z/gelu'
                + th * wp * ch * 4                     # dh_acc
                + 2 * (th + 5) * wp * sp * 4           # fwd scores+probs slab
                + 3 * th * wp * sp * 4                 # bwd p/d_p/d_s
                + 6 * (th + 5) * wp * c * 4)           # xs/ln1/attn/y/ln2/d_ln
        if fixed + int(2.3 * tile) <= vmem_limit:
            best = th
    return best


def _train_fwd_kernel(x_ref, g1_ref, be1_ref, wq_ref, bq_ref, kt_ref, v_ref,
                      wp_ref, bp_ref, g2_ref, be2_ref, w1_ref, b1_ref, wk_ref,
                      bdw_ref, w2_ref, b2_ref, sa_ref, sf_ref, o_ref,
                      *, th: int, h: int, w: int, nkv: int, eps: float):
    """Inference megakernel + per-sample branch scales:
    y = x + s_a·attn(LN1 x); o = y + s_f·FFN(LN2 y)."""
    bi = pl.program_id(0)
    t = pl.program_id(1)
    wp = x_ref.shape[2]
    cdt = wq_ref.dtype
    nh = wq_ref.shape[0]
    sa = sa_ref[bi, 0]
    sf = sf_ref[bi, 0]

    x = x_ref[0, pl.ds(t * th, th + 2)]
    xf = x.astype(jnp.float32)
    ln1 = _ln_f32(xf, g1_ref[0], be1_ref[0], eps).astype(cdt)
    attn = jnp.zeros(xf.shape, jnp.float32) + bp_ref[0]
    for hh in range(nh):
        q = (_dot3(ln1, wq_ref[hh]) + bq_ref[hh]).astype(cdt)
        s = _dot3(q, kt_ref[0, hh])
        lane = jax.lax.broadcasted_iota(jnp.int32, s.shape, 2)
        s = jnp.where(lane < nkv, s, -1e30)
        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s - m)
        p = (p / jnp.sum(p, axis=-1, keepdims=True)).astype(cdt)
        ctx = _dot3(p, v_ref[0, hh]).astype(cdt)
        attn = attn + _dot3(ctx, wp_ref[hh])
    y = xf + sa * attn

    ln2 = _ln_f32(y, g2_ref[0], be2_ref[0], eps).astype(cdt)
    hid = _dot3(ln2, w1_ref[:]) + b1_ref[0]
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
    out = _dot3(acc, w2_ref[:]) + b2_ref[0]
    res = pltpu.roll(y, wp - 1, 1)[1 : th + 1]
    o_ref[0] = (sf * out + res)[:, :w].astype(o_ref.dtype)


def _train_bwd_kernel(x_ref, go_ref, g1_ref, be1_ref, wq_ref, bq_ref, kt_ref,
                      v_ref, wpj_ref, bpj_ref, g2_ref, be2_ref, w1_ref, b1_ref,
                      wk_ref, bdw_ref, w2_ref, sa_ref, sf_ref,
                      dx_ref, dg1_ref, dbe1_ref, dwq_ref, dbq_ref, dkt_ref,
                      dv_ref, dwpj_ref, dbp_ref, dg2_ref, dbe2_ref, dw1_ref,
                      db1_ref, dk_ref, dbdw_ref, dw2_ref, db2_ref,
                      *, th: int, h: int, w: int, nkv: int, eps: float):
    """Backward of the full block by recompute-from-x (see module note).

    Row plan (slab row → real row) matches the FFN-half backward: the x
    slab [t·th, t·th+th+5) covers real rows t·th−2 … t·th+th+2, the go slab
    real rows t·th−1 … t·th+th+1; columns keep the 1-left-pad slab
    convention end-to-end (go arrives 1-left-padded too), so the only
    column roll is the final dx write. Padded rows/columns contribute
    exactly zero to every gradient: go is zero there and the hid mask
    zeroes the FFN path, so garbage LN statistics on zero-padding never
    reach an accumulator.
    """
    bi = pl.program_id(0)
    t = pl.program_id(1)
    wp = x_ref.shape[2]
    f32 = jnp.float32
    cdt = wq_ref.dtype
    nh = wq_ref.shape[0]
    sa = sa_ref[bi, 0]
    sf = sf_ref[bi, 0]
    g1 = g1_ref[0]
    be1 = be1_ref[0]
    g2 = g2_ref[0]
    be2 = be2_ref[0]
    w1 = w1_ref[:]
    b1 = b1_ref[0]
    wk = wk_ref[:]
    bdw = bdw_ref[0]
    w2 = w2_ref[:]
    chh = w1.shape[1]

    xs = x_ref[0, pl.ds(t * th, th + 5)].astype(f32)   # real rows t·th−2 …
    gs = go_ref[0, pl.ds(t * th, th + 3)].astype(f32)  # real rows t·th−1 …

    # ---- forward recompute: LN1 → attention → y (whole slab) ----
    mu1 = jnp.mean(xs, axis=-1, keepdims=True)
    var1 = jnp.mean(jnp.square(xs - mu1), axis=-1, keepdims=True)
    rsig1 = jax.lax.rsqrt(var1 + eps)
    xhat1 = (xs - mu1) * rsig1
    ln1 = (xhat1 * g1 + be1).astype(cdt)

    lane = jax.lax.broadcasted_iota(jnp.int32, (th + 5, wp, kt_ref.shape[3]), 2)
    attn = jnp.zeros((th + 5, wp, xs.shape[-1]), f32) + bpj_ref[0]
    for hh in range(nh):
        q = (_dot3(ln1, wq_ref[hh]) + bq_ref[hh]).astype(cdt)
        s = _dot3(q, kt_ref[0, hh])
        s = jnp.where(lane < nkv, s, -1e30)
        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s - m)
        p = (p / jnp.sum(p, axis=-1, keepdims=True)).astype(cdt)
        ctx = _dot3(p, v_ref[0, hh]).astype(cdt)
        attn = attn + _dot3(ctx, wpj_ref[hh])
    y = xs + sa * attn

    # ---- FFN-half recompute on y + its backward (as block_ffn_train) ----
    mu2 = jnp.mean(y, axis=-1, keepdims=True)
    var2 = jnp.mean(jnp.square(y - mu2), axis=-1, keepdims=True)
    rsig2 = jax.lax.rsqrt(var2 + eps)
    xhat2 = (y - mu2) * rsig2
    ln2 = (xhat2 * g2 + be2).astype(cdt)

    hid = jax.lax.dot_general(
        ln2, w1, dimension_numbers=(((2,), (0,)), ((), ())),
        preferred_element_type=f32) + b1
    rg = t * th - 2 + jax.lax.broadcasted_iota(jnp.int32, (th + 5, wp, 1), 0)
    colx = jax.lax.broadcasted_iota(jnp.int32, (th + 5, wp, 1), 1)
    hid = jnp.where((rg >= 0) & (rg < h) & (colx >= 1) & (colx < w + 1),
                    hid, 0.0)
    acc = jnp.zeros((th + 3, wp, chh), f32)
    for dj in range(3):
        sh = hid if dj == 0 else pltpu.roll(hid, wp - dj, 1)
        for di in range(3):
            acc = acc + sh[di : di + th + 3] * wk[di, dj]
    z = acc + bdw

    go_a = pltpu.roll(gs, wp - 1, 1)        # col c = real col c
    go_s = (go_a * sf).astype(cdt)
    d_a = jax.lax.dot_general(
        go_s, w2, dimension_numbers=(((2,), (1,)), ((), ())),
        preferred_element_type=f32)
    phi = jnp.exp(-0.5 * z * z) * 0.3989422804014327
    big = 0.5 * (1.0 + _erf(z * 0.7071067811865476))
    d_z = d_a * (big + z * phi)
    a_act = _gelu_exact(z).astype(cdt)

    dh_acc = jnp.zeros((th, wp, chh), f32)
    for dj in range(3):
        sh = d_z if dj == 0 else pltpu.roll(d_z, dj, 1)
        for di in range(3):
            dh_acc = dh_acc + sh[2 - di : 2 - di + th] * wk[di, dj]
    colv = jax.lax.broadcasted_iota(jnp.int32, (th, wp, 1), 1)
    d_hid = jnp.where((colv >= 1) & (colv < w + 1), dh_acc, 0.0)

    d_hid_b = d_hid.astype(cdt)
    d_ln2 = jax.lax.dot_general(
        d_hid_b, w1, dimension_numbers=(((2,), (1,)), ((), ())),
        preferred_element_type=f32)

    xhat2_t = xhat2[2 : 2 + th]
    dly2 = d_ln2 * g2
    m1 = jnp.mean(dly2, axis=-1, keepdims=True)
    m2 = jnp.mean(dly2 * xhat2_t, axis=-1, keepdims=True)
    d_y_ln = rsig2[2 : 2 + th] * (dly2 - m1 - xhat2_t * m2)
    # d_y in SLAB column convention: gs is already slab-aligned, d_y_ln too
    d_y = gs[1 : th + 1] + d_y_ln  # (th, wp, C) f32

    # ---- attention backward (tile-own rows, slab columns) ----
    d_attn = d_y * sa
    d_attn_b = d_attn.astype(cdt)
    ln1_own = ln1[2 : 2 + th]
    lane_o = jax.lax.broadcasted_iota(jnp.int32, (th, wp, kt_ref.shape[3]), 2)
    d_ln1 = jnp.zeros((th, wp, xs.shape[-1]), f32)
    d2 = lambda a: a.reshape(th * wp, a.shape[-1])
    dwq_ps, dbq_ps, dkt_ps, dv_ps, dwpj_ps = [], [], [], [], []
    for hh in range(nh):
        q_own = (_dot3(ln1_own, wq_ref[hh]) + bq_ref[hh]).astype(cdt)
        s = _dot3(q_own, kt_ref[0, hh])
        s = jnp.where(lane_o < nkv, s, -1e30)
        m = jnp.max(s, axis=-1, keepdims=True)
        e = jnp.exp(s - m)
        p = e / jnp.sum(e, axis=-1, keepdims=True)  # (th, wp, Sp) f32
        p_b = p.astype(cdt)
        ctx_own = _dot3(p_b, v_ref[0, hh]).astype(cdt)
        d_ctx = jax.lax.dot_general(
            d_attn_b, wpj_ref[hh], dimension_numbers=(((2,), (1,)), ((), ())),
            preferred_element_type=f32)  # (th, wp, dh)
        d_ctx_b = d_ctx.astype(cdt)
        d_p = jax.lax.dot_general(
            d_ctx_b, v_ref[0, hh], dimension_numbers=(((2,), (1,)), ((), ())),
            preferred_element_type=f32)  # (th, wp, Sp)
        r = jnp.sum(d_p * p, axis=-1, keepdims=True)
        d_s = (p * (d_p - r)).astype(cdt)
        d_q = jax.lax.dot_general(
            d_s, kt_ref[0, hh], dimension_numbers=(((2,), (1,)), ((), ())),
            preferred_element_type=f32)  # (th, wp, dh)
        d_q_b = d_q.astype(cdt)
        d_ln1 = d_ln1 + jax.lax.dot_general(
            d_q_b, wq_ref[hh], dimension_numbers=(((2,), (1,)), ((), ())),
            preferred_element_type=f32)  # (th, wp, C)
        dwq_ps.append(jax.lax.dot_general(
            d2(ln1_own), d2(d_q_b),
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=f32))  # (C, dh)
        dbq_ps.append(jnp.sum(d_q, axis=(0, 1)))
        dkt_ps.append(jax.lax.dot_general(
            d2(q_own), d2(d_s), dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=f32))  # (dh, Sp)
        dv_ps.append(jax.lax.dot_general(
            d2(p_b), d2(d_ctx_b), dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=f32))  # (Sp, dh)
        dwpj_ps.append(jax.lax.dot_general(
            d2(ctx_own), d2(d_attn_b),
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=f32))  # (dh, C)
    dbp_p = jnp.sum(d_attn, axis=(0, 1))

    xhat1_t = xhat1[2 : 2 + th]
    dly1 = d_ln1 * g1
    n1 = jnp.mean(dly1, axis=-1, keepdims=True)
    n2 = jnp.mean(dly1 * xhat1_t, axis=-1, keepdims=True)
    d_x_ln = rsig1[2 : 2 + th] * (dly1 - n1 - xhat1_t * n2)
    dx_slab = d_y + d_x_ln
    dx_ref[0] = pltpu.roll(dx_slab, wp - 1, 1)[:, :w].astype(dx_ref.dtype)

    # ---- FFN parameter partials ----
    ln2_own = ln2[2 : 2 + th]
    a_own = a_act[1 : th + 1]
    go_own_s = go_s[1 : th + 1]
    dz_own = d_z[1 : th + 1]
    dw2_p = jax.lax.dot_general(
        d2(a_own), d2(go_own_s), dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=f32)
    dw1_p = jax.lax.dot_general(
        d2(ln2_own), d2(d_hid_b), dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=f32)
    db2_p = jnp.sum(go_a[1 : th + 1], axis=(0, 1)) * sf
    db1_p = jnp.sum(d_hid, axis=(0, 1))
    dg2_p = jnp.sum(d_ln2 * xhat2_t, axis=(0, 1))
    dbe2_p = jnp.sum(d_ln2, axis=(0, 1))
    dg1_p = jnp.sum(d_ln1 * xhat1_t, axis=(0, 1))
    dbe1_p = jnp.sum(d_ln1, axis=(0, 1))
    dbdw_p = jnp.sum(dz_own, axis=(0, 1))
    taps = []
    for di in range(3):
        row_taps = []
        for dj in range(3):
            sh = hid if dj == 0 else pltpu.roll(hid, wp - dj, 1)
            row_taps.append(jnp.sum(sh[1 + di : 1 + di + th] * dz_own,
                                    axis=(0, 1)))
        taps.append(jnp.stack(row_taps))
    dk_p = jnp.stack(taps)

    first_tile = t == 0
    first = (bi == 0) & first_tile

    @pl.when(first_tile)
    def _():
        for hh in range(nh):
            dkt_ref[0, hh] = dkt_ps[hh]
            dv_ref[0, hh] = dv_ps[hh]

    @pl.when(jnp.logical_not(first_tile))
    def _():
        for hh in range(nh):
            dkt_ref[0, hh] = dkt_ref[0, hh] + dkt_ps[hh]
            dv_ref[0, hh] = dv_ref[0, hh] + dv_ps[hh]

    @pl.when(first)
    def _():
        for hh in range(nh):
            dwq_ref[hh] = dwq_ps[hh]
            dwpj_ref[hh] = dwpj_ps[hh]
        dbq_ref[...] = jnp.stack(dbq_ps)
        dbp_ref[0] = dbp_p
        dg1_ref[0] = dg1_p
        dbe1_ref[0] = dbe1_p
        dg2_ref[0] = dg2_p
        dbe2_ref[0] = dbe2_p
        dw1_ref[...] = dw1_p
        db1_ref[0] = db1_p
        dk_ref[...] = dk_p
        dbdw_ref[0] = dbdw_p
        dw2_ref[...] = dw2_p
        db2_ref[0] = db2_p

    @pl.when(jnp.logical_not(first))
    def _():
        for hh in range(nh):
            dwq_ref[hh] = dwq_ref[hh] + dwq_ps[hh]
            dwpj_ref[hh] = dwpj_ref[hh] + dwpj_ps[hh]
        dbq_ref[...] = dbq_ref[...] + jnp.stack(dbq_ps)
        dbp_ref[0] = dbp_ref[0] + dbp_p
        dg1_ref[0] = dg1_ref[0] + dg1_p
        dbe1_ref[0] = dbe1_ref[0] + dbe1_p
        dg2_ref[0] = dg2_ref[0] + dg2_p
        dbe2_ref[0] = dbe2_ref[0] + dbe2_p
        dw1_ref[...] = dw1_ref[...] + dw1_p
        db1_ref[0] = db1_ref[0] + db1_p
        dk_ref[...] = dk_ref[...] + dk_p
        dbdw_ref[0] = dbdw_ref[0] + dbdw_p
        dw2_ref[...] = dw2_ref[...] + dw2_p
        db2_ref[0] = db2_ref[0] + db2_p


def _head_stacks(x, k, v, wq, bq, wproj, num_heads, dt):
    """Shared operand restack of ``mit_block_fused`` (head-major weights,
    padded Kᵀ/V stacks with the attention scale folded into Kᵀ)."""
    b, _, _, c = x.shape
    s = k.shape[1]
    nh = num_heads
    dh = c // nh
    sp = -(-s // 128) * 128
    scale = float(dh) ** -0.5
    kt = jnp.pad(
        (k * jnp.asarray(scale, k.dtype)).reshape(b, s, nh, dh).transpose(0, 2, 3, 1),
        ((0, 0), (0, 0), (0, 0), (0, sp - s)))
    vp = jnp.pad(v.reshape(b, s, nh, dh).transpose(0, 2, 1, 3),
                 ((0, 0), (0, 0), (0, sp - s), (0, 0)))
    wqh = wq.reshape(c, nh, dh).transpose(1, 0, 2)
    bqh = bq.astype(jnp.float32).reshape(nh, dh)
    wph = wproj.reshape(nh, dh, c)
    return (kt.astype(dt), vp.astype(dt), wqh.astype(dt), bqh,
            wph.astype(dt), dh, sp, scale)


def mit_block_train_fits(h: int, w: int, c: int, ch: int, nh: int,
                         n_kv: int, dt_bytes: int = 2) -> bool:
    wp = -(-(w + 2) // 8) * 8
    sp = -(-n_kv // 128) * 128
    return (c % nh == 0 and n_kv <= 2048 and
            _pick_th_train_block(h, w, wp, c, ch, nh, c // nh, sp,
                                 dt_bytes) is not None)


@functools.partial(jax.jit, static_argnames=("num_heads", "eps", "interpret"))
def _mit_block_train_fwd(x, g1, be1, wq, bq, k, v, wproj, bproj, g2, be2,
                         w1, b1, kdw, bdw, w2, b2, s_attn, s_ffn,
                         num_heads: int = 1, eps: float = 1e-6,
                         interpret: bool = False):
    b, h, w, c = x.shape
    ch = w1.shape[1]
    s = k.shape[1]
    wp = -(-(w + 2) // 8) * 8
    dt = x.dtype
    sp = -(-s // 128) * 128
    th = _pick_th(h, w, wp, c, ch, num_heads, c // num_heads, sp, dt.itemsize)
    if th is None:  # callers gate on the (stricter) backward picker
        raise ValueError("full-block train forward does not fit VMEM at "
                         f"geometry ({h}, {w}, {c})x{ch}")
    kt, vp, wqh, bqh, wph, dh, sp, _ = _head_stacks(x, k, v, wq, bq, wproj,
                                                    num_heads, dt)
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, wp - w - 1), (0, 0)))
    nh = num_heads
    row = lambda a: a.astype(jnp.float32).reshape(1, -1)
    frame4 = lambda i, t: (i, 0, 0, 0)
    both = lambda i, t: (0, 0)
    three = lambda i, t: (0, 0, 0)
    return pl.pallas_call(
        functools.partial(_train_fwd_kernel, th=th, h=h, w=w, nkv=s, eps=eps),
        out_shape=jax.ShapeDtypeStruct((b, h, w, c), dt),
        grid=(b, h // th),
        in_specs=[
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
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((1, th, w, c), lambda i, t: (i, t, 0, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(
        xp, row(g1), row(be1), wqh, bqh, kt, vp, wph, row(bproj), row(g2),
        row(be2), w1.astype(dt), row(b1),
        kdw.reshape(3, 3, ch).astype(jnp.float32), row(bdw), w2.astype(dt),
        row(b2),
        s_attn.astype(jnp.float32).reshape(b, 1),
        s_ffn.astype(jnp.float32).reshape(b, 1),
    )


@functools.partial(jax.jit, static_argnames=("num_heads", "eps", "interpret"))
def _mit_block_train_bwd(x, g1, be1, wq, bq, k, v, wproj, bproj, g2, be2,
                         w1, b1, kdw, bdw, w2, s_attn, s_ffn, go,
                         num_heads: int = 1, eps: float = 1e-6,
                         interpret: bool = False):
    b, h, w, c = x.shape
    ch = w1.shape[1]
    s = k.shape[1]
    wp = -(-(w + 2) // 8) * 8
    dt = x.dtype
    nh = num_heads
    kt, vp, wqh, bqh, wph, dh, sp, scale = _head_stacks(x, k, v, wq, bq,
                                                        wproj, num_heads, dt)
    th = _pick_th_train_block(h, w, wp, c, ch, nh, dh, sp, dt.itemsize)
    if th is None:
        raise ValueError("full-block train backward does not fit VMEM")
    xp = jnp.pad(x, ((0, 0), (2, 3), (1, wp - w - 1), (0, 0)))
    gp = jnp.pad(go, ((0, 0), (1, 2), (1, wp - w - 1), (0, 0)))
    row = lambda a: a.astype(jnp.float32).reshape(1, -1)
    frame4 = lambda i, t: (i, 0, 0, 0)
    both = lambda i, t: (0, 0)
    three = lambda i, t: (0, 0, 0)
    outs = pl.pallas_call(
        functools.partial(_train_bwd_kernel, th=th, h=h, w=w, nkv=s, eps=eps),
        out_shape=(
            jax.ShapeDtypeStruct((b, h, w, c), dt),          # dx
            jax.ShapeDtypeStruct((1, c), jnp.float32),       # dg1
            jax.ShapeDtypeStruct((1, c), jnp.float32),       # dbe1
            jax.ShapeDtypeStruct((nh, c, dh), jnp.float32),  # dwq
            jax.ShapeDtypeStruct((nh, dh), jnp.float32),     # dbq
            jax.ShapeDtypeStruct((b, nh, dh, sp), jnp.float32),  # dkt
            jax.ShapeDtypeStruct((b, nh, sp, dh), jnp.float32),  # dv
            jax.ShapeDtypeStruct((nh, dh, c), jnp.float32),  # dwproj
            jax.ShapeDtypeStruct((1, c), jnp.float32),       # dbproj
            jax.ShapeDtypeStruct((1, c), jnp.float32),       # dg2
            jax.ShapeDtypeStruct((1, c), jnp.float32),       # dbe2
            jax.ShapeDtypeStruct((c, ch), jnp.float32),      # dw1
            jax.ShapeDtypeStruct((1, ch), jnp.float32),      # db1
            jax.ShapeDtypeStruct((3, 3, ch), jnp.float32),   # dkdw
            jax.ShapeDtypeStruct((1, ch), jnp.float32),      # dbdw
            jax.ShapeDtypeStruct((ch, c), jnp.float32),      # dw2
            jax.ShapeDtypeStruct((1, c), jnp.float32),       # db2
        ),
        grid=(b, h // th),
        in_specs=[
            pl.BlockSpec((1, h + 5, wp, c), frame4, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, h + 3, wp, c), frame4, memory_space=pltpu.VMEM),
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
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, th, w, c), lambda i, t: (i, t, 0, 0),
                         memory_space=pltpu.VMEM),
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
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_TRAIN_VMEM_LIMIT),
        interpret=interpret,
    )(
        xp, gp, row(g1), row(be1), wqh, bqh, kt, vp, wph, row(bproj),
        row(g2), row(be2), w1.astype(dt), row(b1),
        kdw.reshape(3, 3, ch).astype(jnp.float32), row(bdw), w2.astype(dt),
        s_attn.astype(jnp.float32).reshape(b, 1),
        s_ffn.astype(jnp.float32).reshape(b, 1),
    )
    (dx, dg1, dbe1, dwq_h, dbq_h, dkt_h, dv_h, dwpj_h, dbp, dg2, dbe2,
     dw1, db1, dkdw, dbdw, dw2, db2) = outs
    # head-major stacks → flax layouts; undo the scale fold on dK
    dwq = dwq_h.transpose(1, 0, 2).reshape(c, c)
    dbq = dbq_h.reshape(c)
    dwproj = dwpj_h.reshape(c, c)
    # dkt (b, nh, dh, sp) was grad wrt scale·Kᵀ → dk = scale·dktᵀ
    dk = (dkt_h[:, :, :, :s].transpose(0, 3, 1, 2) * scale).reshape(b, s, c)
    dv = dv_h[:, :, :s].transpose(0, 2, 1, 3).reshape(b, s, c)
    return (dx, dg1[0], dbe1[0], dwq, dbq, dk, dv, dwproj, dbp[0], dg2[0],
            dbe2[0], dw1, db1[0], dkdw.reshape(3, 3, 1, ch), dbdw[0], dw2,
            db2[0])


@functools.partial(jax.custom_vjp, nondiff_argnums=(19, 20, 21))
def mit_block_train(x, g1, be1, wq, bq, k, v, wproj, bproj, g2, be2,
                    w1, b1, kdw, bdw, w2, b2, s_attn, s_ffn,
                    num_heads: int = 1, eps: float = 1e-6,
                    interpret: bool = False):
    """Differentiable full MiT block:
    ``y = x + s_attn·attn(LN1 x); out = y + s_ffn·FFN(LN2 y)``.

    ``k``/``v`` are the spatial-reduced per-frame keys/values (B, S, C) —
    computed XLA-side so their own producer chain (sr conv + LN + kv dense)
    backprops through XLA autodiff; this kernel returns their cotangents.
    ``s_attn``/``s_ffn`` (B,) are per-sample stochastic-depth branch scales
    (non-differentiable). All parameter gradients come out of the backward
    kernel in f32.
    """
    return _mit_block_train_fwd(x, g1, be1, wq, bq, k, v, wproj, bproj,
                                g2, be2, w1, b1, kdw, bdw, w2, b2,
                                s_attn, s_ffn, num_heads, eps, interpret)


def _mbt_fwd(x, g1, be1, wq, bq, k, v, wproj, bproj, g2, be2, w1, b1, kdw,
             bdw, w2, b2, s_attn, s_ffn, num_heads, eps, interpret):
    out = _mit_block_train_fwd(x, g1, be1, wq, bq, k, v, wproj, bproj, g2,
                               be2, w1, b1, kdw, bdw, w2, b2, s_attn, s_ffn,
                               num_heads, eps, interpret)
    return out, (x, g1, be1, wq, bq, k, v, wproj, bproj, g2, be2, w1, b1,
                 kdw, bdw, w2, s_attn, s_ffn)


def _mbt_bwd(num_heads, eps, interpret, res, g):
    (x, g1, be1, wq, bq, k, v, wproj, bproj, g2, be2, w1, b1, kdw, bdw, w2,
     s_attn, s_ffn) = res
    (dx, dg1, dbe1, dwq, dbq, dk, dv, dwproj, dbp, dg2, dbe2, dw1, db1,
     dkdw, dbdw, dw2, db2) = _mit_block_train_bwd(
        x, g1, be1, wq, bq, k, v, wproj, bproj, g2, be2, w1, b1, kdw, bdw,
        w2, s_attn, s_ffn, g, num_heads, eps, interpret)
    return (dx, dg1.astype(g1.dtype), dbe1.astype(be1.dtype),
            dwq.astype(wq.dtype), dbq.astype(bq.dtype), dk.astype(k.dtype),
            dv.astype(v.dtype), dwproj.astype(wproj.dtype),
            dbp.astype(bproj.dtype), dg2.astype(g2.dtype),
            dbe2.astype(be2.dtype), dw1.astype(w1.dtype),
            db1.astype(b1.dtype), dkdw.astype(kdw.dtype),
            dbdw.astype(bdw.dtype), dw2.astype(w2.dtype),
            db2.astype(b1.dtype), jnp.zeros_like(s_attn),
            jnp.zeros_like(s_ffn))


mit_block_train.defvjp(_mbt_fwd, _mbt_bwd)


def mit_block_train_xla(x, g1, be1, wq, bq, k, v, wproj, bproj, g2, be2,
                        w1, b1, kdw, bdw, w2, b2, s_attn, s_ffn,
                        num_heads: int = 1, eps: float = 1e-6):
    """Identical-math XLA composition (oracle) with branch scales."""
    dt = x.dtype
    f32 = jnp.float32
    sa = s_attn.astype(f32)[:, None, None, None]
    sf = s_ffn.astype(f32)[:, None, None, None]
    c = x.shape[-1]
    nh, dh = num_heads, c // num_heads
    ns = k.shape[1]
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
    y = xf + sa * ao
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
    return (y + sf * out.astype(f32)).astype(dt)
