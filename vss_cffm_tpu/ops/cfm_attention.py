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

Differentiable: the Pallas forward carries a ``jax.custom_vjp`` whose
backward is the VJP of the (mathematically identical) XLA formulation, so
the same code path serves training. Falls back to the XLA formulation
off-TPU.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["cfm_attention"]


def _kernel(q_ref, kt_ref, v_ref, bias_ref, mask_ref, o_ref):
    """One program = one (head, tile of tw windows)."""
    q = q_ref[0]  # (tw, 49, hd) bf16, pre-scaled
    kt = kt_ref[0]  # (tw, hd, N)
    scores = jax.lax.dot_general(
        q, kt,
        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )  # (tw, 49, N) f32
    scores = scores + bias_ref[0][None]
    scores = scores + mask_ref[...][:, None, :]
    m = jnp.max(scores, axis=-1, keepdims=True)
    e = jnp.exp(scores - m)
    p = e / jnp.sum(e, axis=-1, keepdims=True)
    v = v_ref[0]  # (tw, N, hd)
    out = jax.lax.dot_general(
        p.astype(v.dtype), v,
        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )  # (tw, 49, hd)
    o_ref[0] = out.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("nh", "interpret"))
def _cfm_attention_pallas_impl(q, ks, vs, bias, mask, nh: int, interpret: bool = False):
    n_w0, area, c = q.shape
    hd = c // nh
    scale = hd**-0.5

    tw = 8
    n_w = -(-n_w0 // tw) * tw
    k_all = jnp.concatenate(ks, axis=1)
    v_all = jnp.concatenate(vs, axis=1)
    n_total = k_all.shape[1]
    if n_w != n_w0:
        pad = [(0, n_w - n_w0)]
        q = jnp.pad(q, pad + [(0, 0), (0, 0)])
        k_all = jnp.pad(k_all, pad + [(0, 0), (0, 0)])
        v_all = jnp.pad(v_all, pad + [(0, 0), (0, 0)])
        mask = jnp.pad(mask, pad + [(0, 0)])

    # head-major layouts (single cheap bf16 transposes in XLA)
    qh = (q * scale).reshape(n_w, area, nh, hd).transpose(2, 0, 1, 3)
    kt = k_all.reshape(n_w, n_total, nh, hd).transpose(2, 0, 3, 1)  # (nh,nW,hd,N)
    vh = v_all.reshape(n_w, n_total, nh, hd).transpose(2, 0, 1, 3)  # (nh,nW,N,hd)

    grid = (nh, n_w // tw)  # window-tile minor: bias/q re-fetch only per head
    out = pl.pallas_call(
        _kernel,
        out_shape=jax.ShapeDtypeStruct((nh, n_w, area, hd), q.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, tw, area, hd), lambda h, i: (h, i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tw, hd, n_total), lambda h, i: (h, i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tw, n_total, hd), lambda h, i: (h, i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, area, n_total), lambda h, i: (h, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tw, n_total), lambda h, i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, tw, area, hd), lambda h, i: (h, i, 0, 0), memory_space=pltpu.VMEM
        ),
        interpret=interpret,
    )(qh, kt, vh, bias.astype(jnp.float32), mask.astype(jnp.float32))
    # (nh, nW, 49, hd) -> (nW, 49, C)
    return out.transpose(1, 2, 0, 3).reshape(n_w, area, c)[:n_w0]


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


# --- differentiable Pallas wrapper: XLA-formulation VJP ---------------------
@functools.partial(jax.custom_vjp, nondiff_argnums=(5,))
def _cfm_attention_pallas(q, ks, vs, bias, mask, nh: int):
    return _cfm_attention_pallas_impl(q, tuple(ks), tuple(vs), bias, mask, nh)


def _cfm_fwd(q, ks, vs, bias, mask, nh: int):
    return _cfm_attention_pallas(q, ks, vs, bias, mask, nh), (q, ks, vs, bias, mask)


def _cfm_bwd(nh: int, res, g):
    q, ks, vs, bias, mask = res
    # exact-softmax attention: the XLA formulation computes the same function,
    # so its VJP is the correct gradient for the kernel's output
    _, vjp = jax.vjp(lambda *a: _cfm_attention_xla(*a, nh), q, ks, vs, bias, mask)
    return vjp(g)


_cfm_attention_pallas.defvjp(_cfm_fwd, _cfm_bwd)


def cfm_attention(q, ks, vs, bias, mask, nh: int, force: str | None = None,
                  train: bool = False):
    """force: None (auto) | 'pallas' | 'xla' | 'interpret'.

    Auto policy: the Pallas kernel for TPU *inference*; the XLA streaming
    formulation for training and off-TPU. The kernel is differentiable (its
    custom_vjp replays the XLA formulation), but that replay re-runs the
    whole attention forward inside the backward pass — measured ~+7 ms on
    the CFFM-B1 train step — so training prefers XLA's own linearization.
    """
    if force == "interpret":
        return _cfm_attention_pallas_impl(q, tuple(ks), tuple(vs), bias, mask, nh, interpret=True)
    if force == "pallas":
        return _cfm_attention_pallas(q, tuple(ks), tuple(vs), bias, mask, nh)
    if force == "xla":
        return _cfm_attention_xla(q, ks, vs, bias, mask, nh)
    platform = jax.devices()[0].platform
    if platform in ("tpu", "axon") and not train:
        return _cfm_attention_pallas(q, tuple(ks), tuple(vs), bias, mask, nh)
    return _cfm_attention_xla(q, ks, vs, bias, mask, nh)
