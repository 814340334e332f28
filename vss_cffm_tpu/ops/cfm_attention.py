"""Fused CFM window attention — Pallas TPU kernel.

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

  q  (nh, nW, 49, hd)   k^T (nh, nW, hd, N)   v (nh, nW, N, hd)

The K/V *assembly* (window partition, rolls, patch extraction) stays in
XLA — those are structured reshapes/convolutions the compiler already
lowers well; the kernel takes the concatenated K/V.

API::

    out = cfm_attention(q, ks, vs, bias, mask, nh)   # window-major
      q    (nW, 49, nh*hd)
      ks   list of (nW, n_g, nh*hd)
      vs   list of (nW, n_g, nh*hd)
      bias (nh, 49, N)   N = Σ n_g
      mask (nW, N)       additive 0 / −100

Differentiable: the Pallas forward carries a ``jax.custom_vjp``; in
training the forward kernel additionally saves the softmax probabilities
and a second Pallas kernel computes dq/dk/dv/dbias from them directly —
no forward recompute, no XLA replay. (Set ``_BWD='xla'`` to fall back to
the VJP of the identical-math XLA formulation, which is also the test
oracle.) Falls back to the XLA formulation off-TPU.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["cfm_attention"]


def _softmax_probs(q, kt, bias_ref, mask_ref):
    scores = jax.lax.dot_general(
        q, kt,
        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )  # (tw, 49, N) f32
    scores = scores + bias_ref[0][None]
    scores = scores + mask_ref[...][:, None, :]
    m = jnp.max(scores, axis=-1, keepdims=True)
    e = jnp.exp(scores - m)
    return e / jnp.sum(e, axis=-1, keepdims=True)


def _kernel(q_ref, kt_ref, v_ref, bias_ref, mask_ref, o_ref):
    """One program = one (head, tile of tw windows)."""
    p = _softmax_probs(q_ref[0], kt_ref[0], bias_ref, mask_ref)
    v = v_ref[0]  # (tw, N, hd)
    out = jax.lax.dot_general(
        p.astype(v.dtype), v,
        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )  # (tw, 49, hd)
    o_ref[0] = out.astype(o_ref.dtype)


def _kernel_with_p(q_ref, kt_ref, v_ref, bias_ref, mask_ref, o_ref, p_ref):
    """Forward that also materialises the probabilities (training residual)."""
    p = _softmax_probs(q_ref[0], kt_ref[0], bias_ref, mask_ref)
    v = v_ref[0]
    out = jax.lax.dot_general(
        p.astype(v.dtype), v,
        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )
    o_ref[0] = out.astype(o_ref.dtype)
    p_ref[0] = p.astype(p_ref.dtype)


def _bwd_kernel(p_ref, g_ref, qs_ref, kt_ref, v_ref,
                dq_ref, dk_ref, dv_ref, dbias_ref):
    """Attention backward from saved probabilities (no forward recompute).

    dP = g·Vᵀ; dS = P ∘ (dP − Σ_k dP∘P); dqs = dS·K; dK = dSᵀ·qs;
    dV = Pᵀ·g; dbias = Σ_windows dS (accumulated across window tiles — the
    dbias output block is revisited for every i at fixed head).
    """
    i = pl.program_id(1)
    p = p_ref[0].astype(jnp.float32)  # (tw, 49, N)
    g = g_ref[0]  # (tw, 49, hd) bf16
    v = v_ref[0]  # (tw, N, hd)
    dp = jax.lax.dot_general(
        g, v,
        dimension_numbers=(((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )  # (tw, 49, N)
    r = jnp.sum(dp * p, axis=-1, keepdims=True)
    ds = p * (dp - r)  # (tw, 49, N) f32
    ds_b = ds.astype(g.dtype)
    kt = kt_ref[0]  # (tw, hd, N)
    dq_ref[0] = jax.lax.dot_general(
        ds_b, kt,
        dimension_numbers=(((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    ).astype(dq_ref.dtype)  # (tw, 49, hd)
    qs = qs_ref[0]  # (tw, 49, hd)
    dk_ref[0] = jax.lax.dot_general(
        ds_b, qs,
        dimension_numbers=(((1,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    ).astype(dk_ref.dtype)  # (tw, N, hd)
    dv_ref[0] = jax.lax.dot_general(
        p.astype(g.dtype), g,
        dimension_numbers=(((1,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    ).astype(dv_ref.dtype)  # (tw, N, hd)
    db = jnp.sum(ds, axis=0)  # (49, N)

    @pl.when(i == 0)
    def _():
        dbias_ref[0] = db

    @pl.when(i > 0)
    def _():
        dbias_ref[0] = dbias_ref[0] + db


_TW = 8


def _head_major(q, ks, vs, mask, nh: int):
    """Pad the window axis to the tile and build head-major Q/Kᵀ/V."""
    n_w0, area, c = q.shape
    hd = c // nh
    scale = hd**-0.5
    n_w = -(-n_w0 // _TW) * _TW
    k_all = jnp.concatenate(ks, axis=1)
    v_all = jnp.concatenate(vs, axis=1)
    n_total = k_all.shape[1]
    if n_w != n_w0:
        pad = [(0, n_w - n_w0)]
        q = jnp.pad(q, pad + [(0, 0), (0, 0)])
        k_all = jnp.pad(k_all, pad + [(0, 0), (0, 0)])
        v_all = jnp.pad(v_all, pad + [(0, 0), (0, 0)])
        mask = jnp.pad(mask, pad + [(0, 0)])
    qh = (q * scale).reshape(n_w, area, nh, hd).transpose(2, 0, 1, 3)
    kt = k_all.reshape(n_w, n_total, nh, hd).transpose(2, 0, 3, 1)  # (nh,nW,hd,N)
    vh = v_all.reshape(n_w, n_total, nh, hd).transpose(2, 0, 1, 3)  # (nh,nW,N,hd)
    return qh, kt, vh, mask, n_w, n_total


@functools.partial(jax.jit, static_argnames=("nh", "interpret", "with_probs"))
def _cfm_attention_pallas_impl(q, ks, vs, bias, mask, nh: int,
                               interpret: bool = False, with_probs: bool = False):
    n_w0, area, c = q.shape
    hd = c // nh
    qh, kt, vh, mask_p, n_w, n_total = _head_major(q, ks, vs, mask, nh)

    grid = (nh, n_w // _TW)  # window-tile minor: bias/q re-fetch only per head
    in_specs = [
        pl.BlockSpec((1, _TW, area, hd), lambda h, i: (h, i, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, _TW, hd, n_total), lambda h, i: (h, i, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, _TW, n_total, hd), lambda h, i: (h, i, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, area, n_total), lambda h, i: (h, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((_TW, n_total), lambda h, i: (i, 0), memory_space=pltpu.VMEM),
    ]
    out_spec = pl.BlockSpec(
        (1, _TW, area, hd), lambda h, i: (h, i, 0, 0), memory_space=pltpu.VMEM
    )
    if with_probs:
        out, probs = pl.pallas_call(
            _kernel_with_p,
            out_shape=(
                jax.ShapeDtypeStruct((nh, n_w, area, hd), q.dtype),
                jax.ShapeDtypeStruct((nh, n_w, area, n_total),
                                     _PROBS_DTYPE or q.dtype),
            ),
            grid=grid,
            in_specs=in_specs,
            out_specs=(out_spec,
                       pl.BlockSpec((1, _TW, area, n_total),
                                    lambda h, i: (h, i, 0, 0),
                                    memory_space=pltpu.VMEM)),
            interpret=interpret,
        )(qh, kt, vh, bias.astype(jnp.float32), mask_p.astype(jnp.float32))
        return out.transpose(1, 2, 0, 3).reshape(n_w, area, c)[:n_w0], probs
    out = pl.pallas_call(
        _kernel,
        out_shape=jax.ShapeDtypeStruct((nh, n_w, area, hd), q.dtype),
        grid=grid,
        in_specs=in_specs,
        out_specs=out_spec,
        interpret=interpret,
    )(qh, kt, vh, bias.astype(jnp.float32), mask_p.astype(jnp.float32))
    # (nh, nW, 49, hd) -> (nW, 49, C)
    return out.transpose(1, 2, 0, 3).reshape(n_w, area, c)[:n_w0]


@functools.partial(jax.jit, static_argnames=("nh", "interpret"))
def _cfm_attention_bwd_pallas(q, ks, vs, mask, probs, g, nh: int,
                              interpret: bool = False):
    """Gradients (dq, dks, dvs, dbias) from the saved probabilities."""
    n_w0, area, c = q.shape
    hd = c // nh
    scale = hd**-0.5
    qh, kt, vh, _, n_w, n_total = _head_major(q, ks, vs, mask, nh)
    if n_w != n_w0:  # padded windows carry zero cotangent
        g = jnp.pad(g, [(0, n_w - n_w0), (0, 0), (0, 0)])
    gh = g.reshape(n_w, area, nh, hd).transpose(2, 0, 1, 3)

    grid = (nh, n_w // _TW)
    blk = lambda shape: pl.BlockSpec(shape, lambda h, i: (h, i, 0, 0),
                                     memory_space=pltpu.VMEM)
    dq_h, dk_h, dv_h, dbias = pl.pallas_call(
        _bwd_kernel,
        out_shape=(
            # dq/dk/dv in the compute dtype: the downstream group splits and
            # head-merge transposes then move half the bytes (f32 outputs
            # cost 1.4 ms/step in slices alone)
            jax.ShapeDtypeStruct((nh, n_w, area, hd), q.dtype),
            jax.ShapeDtypeStruct((nh, n_w, n_total, hd), q.dtype),
            jax.ShapeDtypeStruct((nh, n_w, n_total, hd), q.dtype),
            jax.ShapeDtypeStruct((nh, area, n_total), jnp.float32),
        ),
        grid=grid,
        in_specs=[
            blk((1, _TW, area, n_total)),   # probs
            blk((1, _TW, area, hd)),        # g
            blk((1, _TW, area, hd)),        # q·scale
            blk((1, _TW, hd, n_total)),     # kᵀ
            blk((1, _TW, n_total, hd)),     # v
        ],
        out_specs=(
            blk((1, _TW, area, hd)),
            blk((1, _TW, n_total, hd)),
            blk((1, _TW, n_total, hd)),
            # dbias block revisited across window tiles (accumulation)
            pl.BlockSpec((1, area, n_total), lambda h, i: (h, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        interpret=interpret,
    )(probs, gh, qh, kt, vh)

    dq = (dq_h * scale).transpose(1, 2, 0, 3).reshape(n_w, area, c)[:n_w0]
    dk = dk_h.transpose(1, 2, 0, 3).reshape(n_w, n_total, c)[:n_w0]
    dv = dv_h.transpose(1, 2, 0, 3).reshape(n_w, n_total, c)[:n_w0]
    gsizes = [int(k.shape[1]) for k in ks]
    offs = np.cumsum([0] + gsizes)
    dks = tuple(dk[:, offs[i]:offs[i + 1]].astype(ks[i].dtype) for i in range(len(ks)))
    dvs = tuple(dv[:, offs[i]:offs[i + 1]].astype(vs[i].dtype) for i in range(len(vs)))
    return dq.astype(q.dtype), dks, dvs, dbias


def _cfm_attention_xla(q, ks, vs, bias, mask, nh: int):
    """Streaming-softmax formulation: per-group scores are never concatenated.

    Exact two-pass online softmax over the source groups — pass 1 computes
    the global max, pass 2 accumulates exp-weighted V sums and the
    denominator per group. Removes the (nW, nh, 49, N) score-concat tensor
    (the largest decoder intermediate) from HBM entirely.
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
# forward kernel + hand-written backward kernel from saved probabilities.
# _BWD='xla' falls back to the VJP of the (identical-math) XLA formulation —
# the correctness oracle for the backward kernel.
_BWD = "kernel"

# Residual dtype for the saved softmax probabilities. None = q.dtype, i.e.
# bf16 in the bf16 train config: the backward consumes probs rounded to bf16
# while the forward used f32 in-VMEM — ≤1% relative gradient error (on-device
# parity in tools/validate_tpu.py stays within 0.7 abs on O(50) grads, and the
# attention grads are themselves downstream of bf16 matmuls of similar noise).
# Set to jnp.float32 to rule the residual out when chasing convergence drift,
# at 2× the residual HBM write+read.
_PROBS_DTYPE = None


@functools.partial(jax.custom_vjp, nondiff_argnums=(5,))
def _cfm_attention_pallas(q, ks, vs, bias, mask, nh: int):
    return _cfm_attention_pallas_impl(q, tuple(ks), tuple(vs), bias, mask, nh)


def _cfm_fwd(q, ks, vs, bias, mask, nh: int):
    if _BWD == "kernel":
        out, probs = _cfm_attention_pallas_impl(
            q, tuple(ks), tuple(vs), bias, mask, nh, with_probs=True)
        return out, (q, ks, vs, bias, mask, probs)
    return _cfm_attention_pallas(q, ks, vs, bias, mask, nh), (q, ks, vs, bias, mask, None)


def _cfm_bwd(nh: int, res, g):
    q, ks, vs, bias, mask, probs = res
    if probs is not None:
        dq, dks, dvs, dbias = _cfm_attention_bwd_pallas(
            q, tuple(ks), tuple(vs), mask, probs, g, nh)
        # bias enters pre-softmax exactly like scores; mask is a constant
        # geometry table (−100 pads): its cotangent is discarded upstream
        return dq, dks, dvs, dbias.astype(bias.dtype), jnp.zeros_like(mask)
    # exact-softmax attention: the XLA formulation computes the same function,
    # so its VJP is the correct gradient for the kernel's output
    _, vjp = jax.vjp(lambda *a: _cfm_attention_xla(*a, nh), q, ks, vs, bias, mask)
    return vjp(g)


_cfm_attention_pallas.defvjp(_cfm_fwd, _cfm_bwd)


def cfm_attention(q, ks, vs, bias, mask, nh: int, force: str | None = None,
                  train: bool = False):
    """force: None (auto) | 'pallas' | 'xla' | 'interpret'.

    Auto policy: the Pallas kernels on TPU for both inference and training —
    the forward saves the softmax probabilities and the backward kernel
    consumes them directly (no recompute/replay); off-TPU uses the XLA
    streaming formulation. ``train`` is accepted for call-site symmetry with
    ``dwconv3x3`` (both paths are now kernel-served).
    """
    if force == "interpret":
        return _cfm_attention_pallas_impl(q, tuple(ks), tuple(vs), bias, mask, nh, interpret=True)
    if force == "pallas":
        return _cfm_attention_pallas(q, tuple(ks), tuple(vs), bias, mask, nh)
    if force == "xla":
        return _cfm_attention_xla(q, ks, vs, bias, mask, nh)
    platform = jax.devices()[0].platform
    if platform in ("tpu", "axon"):
        return _cfm_attention_pallas(q, tuple(ks), tuple(vs), bias, mask, nh)
    return _cfm_attention_xla(q, ks, vs, bias, mask, nh)
