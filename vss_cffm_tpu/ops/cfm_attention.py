"""Fused CFM window attention — Pallas TPU kernels.

Fuses the score assembly + bias/mask add + f32 softmax + AV of the CFM
attention (see ``models/cffm_transformer.CFFMWindowAttention``) into one
VMEM-resident pass per (head, window-tile). Under XLA these steps
materialize the (nW, nh, 49, N) scores in f32 plus four head-split
transposes of Q/K/V/out per block (~0.5 ms of a ~5 ms CFFM-B1 forward);
here scores never leave VMEM and the only HBM passes are one read of
Q/K/V and one write of the output.

Head-major design (this is what makes it beat XLA at head_dim 32, where a
head-batched in-kernel reshape/transpose is a Mosaic relayout): the wrapper
pre-transposes Q/K/V to head-major layouts *once* in XLA — cheap bf16
copies — and the kernel grid is (heads, window-tiles), so each program
works on plain 2-D (window, source) tiles with zero in-kernel relayout:

  q  (nh, nW, 49, hd)   kᵀ_g (nh, nW, hd, n_g)   v_g (nh, nW, n_g, hd)

**Grouped K/V (round 3)**: the K/V source groups (own window, rolled
neighbours, per-level pooled patches) are passed as SEPARATE refs and the
kernel concatenates the tiles in VMEM (lane/sublane copies, no HBM) so
the MXU keeps single-matmul shapes. Round 2 concatenated K/V in XLA; the
concat + window-pad + backward group-split cost ~6 ms of the B=8 train
step as pure HBM traffic. The window axis is likewise un-padded: the grid
ceil-divides nW and Pallas masks the ragged tail writes (the backward
masks the tail's dbias contribution explicitly — dbias is the only
cross-window reduction).

API (unchanged from round 2 — bias/mask arrive concatenated; both are
small and feed the kernel whole)::

    out = cfm_attention(q, ks, vs, bias, mask, nh)   # window-major
      q    (nW, 49, nh*hd)
      ks   list of (nW, n_g, nh*hd)
      vs   list of (nW, n_g, nh*hd)
      bias (nh, 49, N)   N = Σ n_g
      mask (nW, N)       additive 0 / −100

Differentiable: the Pallas forward carries a ``jax.custom_vjp``; in
training the forward kernel additionally saves the per-group softmax
probabilities and a second Pallas kernel computes dq/dk/dv/dbias from them
directly — no forward recompute, no XLA replay. (Set ``_BWD='xla'`` to
fall back to the VJP of the identical-math XLA formulation, which is also
the test oracle.) Falls back to the XLA formulation off-TPU.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["cfm_attention"]

_TW = 8


def _group_sizes(ks) -> list[int]:
    return [int(k.shape[1]) for k in ks]


def _head_major(q, ks, vs, nh: int):
    """Per-group head-major Qᵀ/Kᵀ/V — no concat, no window padding."""
    n_w0, area, c = q.shape
    hd = c // nh
    scale = hd**-0.5
    qh = (q * scale).reshape(n_w0, area, nh, hd).transpose(2, 0, 1, 3)
    kts = tuple(
        k.reshape(n_w0, k.shape[1], nh, hd).transpose(2, 0, 3, 1) for k in ks
    )  # (nh, nW, hd, n_g)
    vhs = tuple(
        v.reshape(n_w0, v.shape[1], nh, hd).transpose(2, 0, 1, 3) for v in vs
    )  # (nh, nW, n_g, hd)
    return qh, kts, vhs


def _fwd_kernel(*refs, G: int, with_probs: bool):
    """One program = one (head, tile of tw windows).

    The per-group K/V tiles are concatenated IN VMEM (lane/sublane copies,
    no HBM traffic) so the MXU sees the round-2 single-matmul shapes —
    per-group matmuls would pad every n_g to a full 128-lane tile
    (measured +2.4 ms/step on the fwd at the B=8 train geometry).
    """
    q_ref = refs[0]
    kts = refs[1 : 1 + G]
    vhs = refs[1 + G : 1 + 2 * G]
    bias_ref = refs[1 + 2 * G]
    mask_ref = refs[2 + 2 * G]
    o_ref = refs[3 + 2 * G]
    p_ref = refs[4 + 2 * G] if with_probs else None

    q = q_ref[0]  # (tw, 49, hd)
    kt_all = jnp.concatenate([r[0] for r in kts], axis=-1)  # (tw, hd, N)
    v_all = jnp.concatenate([r[0] for r in vhs], axis=1)    # (tw, N, hd)
    scores = jax.lax.dot_general(
        q, kt_all,
        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )  # (tw, 49, N)
    scores = scores + bias_ref[0][None]
    scores = scores + mask_ref[...][:, None, :]
    m = jnp.max(scores, axis=-1, keepdims=True)
    e = jnp.exp(scores - m)
    p = e / jnp.sum(e, axis=-1, keepdims=True)
    out = jax.lax.dot_general(
        p.astype(v_all.dtype), v_all,
        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )  # (tw, 49, hd)
    o_ref[0] = out.astype(o_ref.dtype)
    if with_probs:
        p_ref[0] = p.astype(p_ref.dtype)


def _bwd_kernel_rc(*refs, G: int, tw: int, n_w0: int, gsizes: tuple):
    """Attention backward with the softmax RECOMPUTED in-kernel (flash
    style) from qs/K/bias/mask — the probabilities never touch HBM in
    either direction. Identical math to the forward kernel's softmax (same
    inputs, same f32 ops), so the gradient quality of the f32-probs
    residual is kept while its ~0.73 GB/step of HBM round-trip
    (round-5: ~2-3 ms of the B=8 step) disappears. Everything after ``p``
    matches ``_bwd_kernel``."""
    g_ref, qs_ref = refs[0], refs[1]
    kts = refs[2 : 2 + G]
    vhs = refs[2 + G : 2 + 2 * G]
    bias_ref = refs[2 + 2 * G]
    mask_ref = refs[3 + 2 * G]
    dq_ref = refs[4 + 2 * G]
    dk_refs = refs[5 + 2 * G : 5 + 3 * G]
    dv_refs = refs[5 + 3 * G : 5 + 4 * G]
    db_ref = refs[5 + 4 * G]

    i = pl.program_id(1)
    gcot = g_ref[0]  # (tw, 49, hd) bf16
    qs = qs_ref[0]
    kt_all = jnp.concatenate([r[0] for r in kts], axis=-1)  # (tw, hd, N)
    v_all = jnp.concatenate([r[0] for r in vhs], axis=1)    # (tw, N, hd)

    scores = jax.lax.dot_general(
        qs, kt_all, dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)
    scores = scores + bias_ref[0][None]
    scores = scores + mask_ref[...][:, None, :]
    m = jnp.max(scores, axis=-1, keepdims=True)
    e = jnp.exp(scores - m)
    p = e / jnp.sum(e, axis=-1, keepdims=True)  # (tw, 49, N) f32

    dp = jax.lax.dot_general(
        gcot, v_all, dimension_numbers=(((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)
    r = jnp.sum(dp * p, axis=-1, keepdims=True)
    ds = p * (dp - r)
    ds_b = ds.astype(gcot.dtype)
    dq_ref[0] = jax.lax.dot_general(
        ds_b, kt_all, dimension_numbers=(((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32).astype(dq_ref.dtype)
    dk_all = jax.lax.dot_general(
        ds_b, qs, dimension_numbers=(((1,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)
    dv_all = jax.lax.dot_general(
        p.astype(gcot.dtype), gcot,
        dimension_numbers=(((1,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)
    off = 0
    for g in range(G):
        n_g = gsizes[g]
        dk_refs[g][0] = dk_all[:, off : off + n_g].astype(dk_refs[g].dtype)
        dv_refs[g][0] = dv_all[:, off : off + n_g].astype(dv_refs[g].dtype)
        off += n_g

    valid = (i * tw + jax.lax.broadcasted_iota(jnp.int32, (tw, 1, 1), 0)) < n_w0
    db = jnp.sum(jnp.where(valid, ds, 0.0), axis=0)  # (49, N)

    @pl.when(i == 0)
    def _():
        db_ref[0] = db

    @pl.when(i > 0)
    def _():
        db_ref[0] = db_ref[0] + db


@functools.partial(jax.jit, static_argnames=("nh", "interpret"))
def _cfm_attention_bwd_pallas_rc(q, ks, vs, bias, mask, g, nh: int,
                                 interpret: bool = False):
    """Gradients with in-kernel softmax recompute (no probs residual)."""
    n_w0, area, c = q.shape
    hd = c // nh
    scale = hd**-0.5
    gsizes = _group_sizes(ks)
    G = len(gsizes)
    n_total = sum(gsizes)
    qh, kts, vhs = _head_major(q, ks, vs, nh)
    gh = g.reshape(n_w0, area, nh, hd).transpose(2, 0, 1, 3)

    grid = (nh, -(-n_w0 // _TW))
    blk = lambda *shape: pl.BlockSpec((1, _TW) + shape, lambda h, i: (h, i, 0, 0),
                                      memory_space=pltpu.VMEM)
    outs = pl.pallas_call(
        functools.partial(_bwd_kernel_rc, G=G, tw=_TW, n_w0=n_w0,
                          gsizes=tuple(gsizes)),
        out_shape=(
            jax.ShapeDtypeStruct((nh, n_w0, area, hd), q.dtype),
            *[jax.ShapeDtypeStruct((nh, n_w0, g_, hd), q.dtype) for g_ in gsizes],
            *[jax.ShapeDtypeStruct((nh, n_w0, g_, hd), q.dtype) for g_ in gsizes],
            jax.ShapeDtypeStruct((nh, area, n_total), jnp.float32),
        ),
        grid=grid,
        in_specs=[
            blk(area, hd),                     # g
            blk(area, hd),                     # q·scale
            *[blk(hd, g_) for g_ in gsizes],   # kᵀ
            *[blk(g_, hd) for g_ in gsizes],   # v
            pl.BlockSpec((1, area, n_total), lambda h, i: (h, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_TW, n_total), lambda h, i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            blk(area, hd),
            *[blk(g_, hd) for g_ in gsizes],
            *[blk(g_, hd) for g_ in gsizes],
            pl.BlockSpec((1, area, n_total), lambda h, i: (h, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        interpret=interpret,
    )(gh, qh, *kts, *vhs, bias.astype(jnp.float32), mask.astype(jnp.float32))
    dq_h = outs[0]
    dks_h = outs[1 : 1 + G]
    dvs_h = outs[1 + G : 1 + 2 * G]
    dbias = outs[1 + 2 * G]

    dq = (dq_h * scale).transpose(1, 2, 0, 3).reshape(n_w0, area, c)
    dks = tuple(
        d.transpose(1, 2, 0, 3).reshape(n_w0, gsizes[i], c).astype(ks[i].dtype)
        for i, d in enumerate(dks_h)
    )
    dvs = tuple(
        d.transpose(1, 2, 0, 3).reshape(n_w0, gsizes[i], c).astype(vs[i].dtype)
        for i, d in enumerate(dvs_h)
    )
    return dq.astype(q.dtype), dks, dvs, dbias


def _bwd_kernel(*refs, G: int, tw: int, n_w0: int, gsizes: tuple):
    """Attention backward from saved probabilities (no forward recompute).

    dP = g·Vᵀ; dS = P ∘ (dP − Σ_k dP∘P); dqs = dS·K; dK = dSᵀ·qs;
    dV = Pᵀ·g; dbias = Σ_valid-windows dS (the dbias output block is
    revisited for every window tile at fixed head; ragged-tail rows are
    masked since Pallas pads out-of-range reads with garbage). K/V group
    tiles concatenate in VMEM for single-matmul MXU shapes; dK/dV write
    back through per-group sublane slices.
    """
    p_ref = refs[0]
    g_ref, qs_ref = refs[1], refs[2]
    kts = refs[3 : 3 + G]
    vhs = refs[3 + G : 3 + 2 * G]
    dq_ref = refs[3 + 2 * G]
    dk_refs = refs[4 + 2 * G : 4 + 3 * G]
    dv_refs = refs[4 + 3 * G : 4 + 4 * G]
    db_ref = refs[4 + 4 * G]

    i = pl.program_id(1)
    gcot = g_ref[0]  # (tw, 49, hd) bf16
    kt_all = jnp.concatenate([r[0] for r in kts], axis=-1)  # (tw, hd, N)
    v_all = jnp.concatenate([r[0] for r in vhs], axis=1)    # (tw, N, hd)
    p = p_ref[0].astype(jnp.float32)  # (tw, 49, N)
    dp = jax.lax.dot_general(
        gcot, v_all,
        dimension_numbers=(((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )  # (tw, 49, N)
    r = jnp.sum(dp * p, axis=-1, keepdims=True)
    ds = p * (dp - r)  # (tw, 49, N) f32
    ds_b = ds.astype(gcot.dtype)
    dq_ref[0] = jax.lax.dot_general(
        ds_b, kt_all,
        dimension_numbers=(((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    ).astype(dq_ref.dtype)  # (tw, 49, hd)
    qs = qs_ref[0]
    dk_all = jax.lax.dot_general(
        ds_b, qs,
        dimension_numbers=(((1,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )  # (tw, N, hd)
    dv_all = jax.lax.dot_general(
        p.astype(gcot.dtype), gcot,
        dimension_numbers=(((1,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )  # (tw, N, hd)
    off = 0
    for g in range(G):
        n_g = gsizes[g]
        dk_refs[g][0] = dk_all[:, off : off + n_g].astype(dk_refs[g].dtype)
        dv_refs[g][0] = dv_all[:, off : off + n_g].astype(dv_refs[g].dtype)
        off += n_g

    valid = (i * tw + jax.lax.broadcasted_iota(jnp.int32, (tw, 1, 1), 0)) < n_w0
    db = jnp.sum(jnp.where(valid, ds, 0.0), axis=0)  # (49, N)

    @pl.when(i == 0)
    def _():
        db_ref[0] = db

    @pl.when(i > 0)
    def _():
        db_ref[0] = db_ref[0] + db


@functools.partial(jax.jit,
                   static_argnames=("nh", "interpret", "with_probs", "grouped"))
def _cfm_attention_pallas_impl(q, ks, vs, bias, mask, nh: int,
                               interpret: bool = False, with_probs: bool = False,
                               grouped: bool = True):
    """``grouped`` selects the K/V HBM layout. True: one ref per source
    group, zero XLA-side concat/pad — wins in training, where the concat +
    window-pad + backward splits cost ~5 ms/step at B=8. False: groups are
    packed into one ref by an XLA concat first — wins at inference batch
    sizes, where the concat is ~0.1 ms and the grouped layout's per-group
    lane padding (each n_g rounds up to 128 lanes in HBM) would add more
    read traffic than the concat costs (measured 4.42 → 4.79 ms fwd).
    """
    n_w0, area, c = q.shape
    hd = c // nh
    if not grouped:
        ks = [jnp.concatenate(list(ks), axis=1)]
        vs = [jnp.concatenate(list(vs), axis=1)]
    gsizes = _group_sizes(ks)
    G = len(gsizes)
    n_total = sum(gsizes)
    qh, kts, vhs = _head_major(q, ks, vs, nh)

    grid = (nh, -(-n_w0 // _TW))  # window-tile minor; ragged tail masked
    q_spec = pl.BlockSpec((1, _TW, area, hd), lambda h, i: (h, i, 0, 0),
                          memory_space=pltpu.VMEM)
    kt_specs = [pl.BlockSpec((1, _TW, hd, g), lambda h, i: (h, i, 0, 0),
                             memory_space=pltpu.VMEM) for g in gsizes]
    v_specs = [pl.BlockSpec((1, _TW, g, hd), lambda h, i: (h, i, 0, 0),
                            memory_space=pltpu.VMEM) for g in gsizes]
    bias_spec = pl.BlockSpec((1, area, n_total), lambda h, i: (h, 0, 0),
                             memory_space=pltpu.VMEM)
    mask_spec = pl.BlockSpec((_TW, n_total), lambda h, i: (i, 0),
                             memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((1, _TW, area, hd), lambda h, i: (h, i, 0, 0),
                            memory_space=pltpu.VMEM)
    operands = (qh, *kts, *vhs, bias.astype(jnp.float32), mask.astype(jnp.float32))
    in_specs = [q_spec, *kt_specs, *v_specs, bias_spec, mask_spec]
    if with_probs:
        p_dtype = _PROBS_DTYPE or q.dtype
        out, probs = pl.pallas_call(
            functools.partial(_fwd_kernel, G=G, with_probs=True),
            out_shape=(
                jax.ShapeDtypeStruct((nh, n_w0, area, hd), q.dtype),
                jax.ShapeDtypeStruct((nh, n_w0, area, n_total), p_dtype),
            ),
            grid=grid,
            in_specs=in_specs,
            out_specs=(out_spec,
                       pl.BlockSpec((1, _TW, area, n_total),
                                    lambda h, i: (h, i, 0, 0),
                                    memory_space=pltpu.VMEM)),
            interpret=interpret,
        )(*operands)
        return out.transpose(1, 2, 0, 3).reshape(n_w0, area, c), probs
    out = pl.pallas_call(
        functools.partial(_fwd_kernel, G=G, with_probs=False),
        out_shape=jax.ShapeDtypeStruct((nh, n_w0, area, hd), q.dtype),
        grid=grid,
        in_specs=in_specs,
        out_specs=out_spec,
        interpret=interpret,
    )(*operands)
    # (nh, nW, 49, hd) -> (nW, 49, C)
    return out.transpose(1, 2, 0, 3).reshape(n_w0, area, c)


@functools.partial(jax.jit, static_argnames=("nh", "interpret"))
def _cfm_attention_bwd_pallas(q, ks, vs, probs, g, nh: int,
                              interpret: bool = False):
    """Gradients (dq, dks, dvs, dbias) from the saved probabilities."""
    n_w0, area, c = q.shape
    hd = c // nh
    scale = hd**-0.5
    gsizes = _group_sizes(ks)
    G = len(gsizes)
    n_total = sum(gsizes)
    qh, kts, vhs = _head_major(q, ks, vs, nh)
    gh = g.reshape(n_w0, area, nh, hd).transpose(2, 0, 1, 3)

    grid = (nh, -(-n_w0 // _TW))
    blk = lambda *shape: pl.BlockSpec((1, _TW) + shape, lambda h, i: (h, i, 0, 0),
                                      memory_space=pltpu.VMEM)
    outs = pl.pallas_call(
        functools.partial(_bwd_kernel, G=G, tw=_TW, n_w0=n_w0,
                          gsizes=tuple(gsizes)),
        out_shape=(
            # dq/dk/dv in the compute dtype: the downstream head-merge
            # transposes then move half the bytes
            jax.ShapeDtypeStruct((nh, n_w0, area, hd), q.dtype),
            *[jax.ShapeDtypeStruct((nh, n_w0, g, hd), q.dtype) for g in gsizes],
            *[jax.ShapeDtypeStruct((nh, n_w0, g, hd), q.dtype) for g in gsizes],
            jax.ShapeDtypeStruct((nh, area, n_total), jnp.float32),
        ),
        grid=grid,
        in_specs=[
            blk(area, n_total),                # probs
            blk(area, hd),                     # g
            blk(area, hd),                     # q·scale
            *[blk(hd, g) for g in gsizes],     # kᵀ
            *[blk(g, hd) for g in gsizes],     # v
        ],
        out_specs=(
            blk(area, hd),
            *[blk(g, hd) for g in gsizes],
            *[blk(g, hd) for g in gsizes],
            # dbias block revisited across window tiles (accumulation)
            pl.BlockSpec((1, area, n_total), lambda h, i: (h, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        interpret=interpret,
    )(probs, gh, qh, *kts, *vhs)
    dq_h = outs[0]
    dks_h = outs[1 : 1 + G]
    dvs_h = outs[1 + G : 1 + 2 * G]
    dbias = outs[1 + 2 * G]

    dq = (dq_h * scale).transpose(1, 2, 0, 3).reshape(n_w0, area, c)
    dks = tuple(
        d.transpose(1, 2, 0, 3).reshape(n_w0, gsizes[i], c).astype(ks[i].dtype)
        for i, d in enumerate(dks_h)
    )
    dvs = tuple(
        d.transpose(1, 2, 0, 3).reshape(n_w0, gsizes[i], c).astype(vs[i].dtype)
        for i, d in enumerate(dvs_h)
    )
    return dq.astype(q.dtype), dks, dvs, dbias


def _cfm_attention_xla(q, ks, vs, bias, mask, nh: int):
    """Streaming-softmax formulation: per-group scores are never concatenated.

    Exact two-pass online softmax over the source groups — pass 1 computes
    the global max, pass 2 accumulates exp-weighted V sums and the
    denominator per group. Removes the (nW, nh, 49, N) score-concat tensor
    (the largest decoder intermediate) from HBM entirely. Identical math to
    the Pallas kernel — its correctness/grad oracle.
    """
    n_w, area, c = q.shape
    hd = c // nh
    scale = hd**-0.5
    qh = q.reshape(n_w, area, nh, hd).transpose(0, 2, 1, 3) * scale

    score_parts = []
    off = 0
    for kg in ks:
        n_g = kg.shape[1]
        khg = kg.reshape(n_w, n_g, nh, hd).transpose(0, 2, 1, 3)
        s = jnp.einsum("whqd,whkd->whqk", qh, khg).astype(jnp.float32)
        s = s + bias[None, :, :, off : off + n_g].astype(jnp.float32)
        s = s + mask[:, None, None, off : off + n_g].astype(jnp.float32)
        score_parts.append(s)
        off += n_g

    m = score_parts[0].max(axis=-1, keepdims=True)
    for s in score_parts[1:]:
        m = jnp.maximum(m, s.max(axis=-1, keepdims=True))

    out = None
    denom = None
    for s, vg in zip(score_parts, vs):
        e = jnp.exp(s - m)
        d = e.sum(axis=-1, keepdims=True)
        denom = d if denom is None else denom + d
        vhg = vg.reshape(n_w, vg.shape[1], nh, hd).transpose(0, 2, 1, 3)
        contrib = jnp.einsum("whqk,whkd->whqd", e.astype(q.dtype), vhg)
        out = contrib if out is None else out + contrib
    out = (out.astype(jnp.float32) / denom).astype(q.dtype)
    return out.transpose(0, 2, 1, 3).reshape(n_w, area, c)


# --- differentiable Pallas wrapper ------------------------------------------
# forward kernel + hand-written backward kernel. Modes:
#   'recompute' (default, round 5): the backward kernel recomputes the
#       softmax in-VMEM from qs/K/bias/mask — f32-exact probabilities with
#       no probs residual in HBM (the 'kernel' mode's f32 residual was
#       ~0.73 GB/step of write+read at the B=8 geometry);
#   'kernel': forward saves the probabilities, backward consumes them;
#   'xla': VJP of the identical-math XLA formulation (correctness oracle).
_BWD = "recompute"

# Residual dtype for the saved softmax probabilities. Default f32: the
# backward then consumes exactly the probabilities the forward computed
# in-VMEM. Measured cost of the 2× residual HBM write+read at the B=8 480²
# train geometry: 175.1 → 176.8 ms/step (~1%, tools/benchmark.py --train
# [--probs-f32], 2026-08-19) — cheap enough to buy back the ~1% relative
# gradient error the bf16-rounded residual carried (round-2 advisor
# finding). Set to None to store in q.dtype (bf16 under the bf16 config)
# when trading gradient fidelity for step time.
_PROBS_DTYPE = jnp.float32


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6))
def _cfm_attention_pallas(q, ks, vs, bias, mask, nh: int,
                          infer_grouped: bool = False):
    # primal (inference-only path of the VJP): ``infer_grouped`` selects the
    # K/V HBM layout — False packs the groups with one XLA concat, True
    # passes grouped refs (the training layout). Which wins is a whole-graph
    # layout-assignment question, so it is measured end-to-end per variant
    # (tools/bench_stage_block.py --e2e [--grouped-kv]) and plumbed from
    # CFFMDecoderConfig.infer_kv_layout.
    return _cfm_attention_pallas_impl(q, tuple(ks), tuple(vs), bias, mask, nh,
                                      grouped=infer_grouped)


def _cfm_fwd(q, ks, vs, bias, mask, nh: int, infer_grouped: bool):
    if _BWD == "recompute":
        out = _cfm_attention_pallas_impl(
            q, tuple(ks), tuple(vs), bias, mask, nh, with_probs=False)
        return out, (q, ks, vs, bias, mask, None)
    if _BWD == "kernel":
        out, probs = _cfm_attention_pallas_impl(
            q, tuple(ks), tuple(vs), bias, mask, nh, with_probs=True)
        return out, (q, ks, vs, bias, mask, probs)
    return (_cfm_attention_pallas(q, ks, vs, bias, mask, nh, infer_grouped),
            (q, ks, vs, bias, mask, None))


def _cfm_bwd(nh: int, infer_grouped: bool, res, g):
    q, ks, vs, bias, mask, probs = res
    if _BWD == "recompute":
        dq, dks, dvs, dbias = _cfm_attention_bwd_pallas_rc(
            q, tuple(ks), tuple(vs), bias, mask, g, nh)
        return dq, dks, dvs, dbias.astype(bias.dtype), jnp.zeros_like(mask)
    if probs is not None:
        dq, dks, dvs, dbias = _cfm_attention_bwd_pallas(
            q, tuple(ks), tuple(vs), probs, g, nh)
        # bias enters pre-softmax exactly like scores; mask is a constant
        # geometry table (−100 pads): its cotangent is discarded upstream
        return dq, dks, dvs, dbias.astype(bias.dtype), jnp.zeros_like(mask)
    # exact-softmax attention: the XLA formulation computes the same function,
    # so its VJP is the correct gradient for the kernel's output
    _, vjp = jax.vjp(lambda *a: _cfm_attention_xla(*a, nh), q, ks, vs, bias, mask)
    return vjp(g)


_cfm_attention_pallas.defvjp(_cfm_fwd, _cfm_bwd)


def cfm_attention(q, ks, vs, bias, mask, nh: int, force: str | None = None,
                  train: bool = False, kv_layout: str = "packed"):
    """force: None (auto) | 'pallas' | 'xla' | 'interpret'.

    Auto policy: the Pallas kernels on TPU for both inference and training —
    the forward saves the softmax probabilities and the backward kernel
    consumes them directly (no recompute/replay); off-TPU uses the XLA
    streaming formulation. ``train`` is accepted for call-site symmetry with
    ``dwconv3x3`` (both paths are now kernel-served). ``kv_layout``
    ('packed' | 'grouped') selects the inference K/V HBM layout — measured
    per variant end-to-end; training always uses grouped refs.
    """
    grouped = kv_layout == "grouped"
    if force == "interpret":
        # exercise the grouped layout (the packed path is the same kernel
        # with a single pre-concatenated group)
        return _cfm_attention_pallas_impl(q, tuple(ks), tuple(vs), bias, mask,
                                          nh, interpret=True)
    if force == "pallas":
        return _cfm_attention_pallas(q, tuple(ks), tuple(vs), bias, mask, nh,
                                     grouped)
    if force == "xla":
        return _cfm_attention_xla(q, ks, vs, bias, mask, nh)
    platform = jax.devices()[0].platform
    if platform in ("tpu", "axon"):
        return _cfm_attention_pallas(q, tuple(ks), tuple(vs), bias, mask, nh,
                                     grouped)
    return _cfm_attention_xla(q, ks, vs, bias, mask, nh)
