"""Fused CFM window attention — Pallas TPU kernel.

Fuses the score concatenation + bias/mask add + f32 softmax + per-group AV
of the CFM attention (see ``models/cffm_transformer.CFFMWindowAttention``)
into one VMEM-resident pass per window tile. Under XLA these steps write the
(B, nW, nh, 49, N) score tensor to HBM in bf16, re-read it for the f32
softmax, and write/read the f32 probabilities again (~80 MB per CFFM block
at 480² eval); here scores never leave VMEM.

The K/V *assembly* (window partition, rolls, patch extraction) stays in XLA
— those are structured reshapes/convolutions the compiler already lowers
well; the kernel takes the per-group K/V tensors as separate inputs.

API::

    out = cfm_attention(q, ks, vs, bias, mask)     # all NHWC-free, window-major
      q    (nW, 49, nh*hd)
      ks   list of (nW, n_g, nh*hd)
      vs   list of (nW, n_g, nh*hd)
      bias (nh, 49, N)   N = Σ n_g
      mask (nW, N)       additive 0 / −100

Falls back to the XLA formulation off-TPU.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["cfm_attention"]


def _kernel(q_ref, *refs, num_groups: int, nh: int, hd: int, tw: int, gsizes):
    k_refs = refs[:num_groups]
    v_refs = refs[num_groups : 2 * num_groups]
    bias_ref, mask_ref, o_ref = refs[2 * num_groups : 2 * num_groups + 3]

    area = q_ref.shape[1]
    n_total = sum(gsizes)
    q = q_ref[:]  # (tw, 49, nh*hd)
    bias = bias_ref[:]  # (nh, 49, N) f32
    mask = mask_ref[:]  # (tw, N) f32

    scale = hd**-0.5
    # fold (tw, nh) into one batch dim — Mosaic matmul supports one batch dim
    qh = (q.reshape(tw, area, nh, hd).transpose(0, 2, 1, 3) * scale).reshape(
        tw * nh, area, hd
    )

    # scores per group, concatenated in-register
    parts = []
    for g in range(num_groups):
        kg = k_refs[g][:]  # (tw, n_g, nh*hd)
        khg = kg.reshape(tw, gsizes[g], nh, hd).transpose(0, 2, 1, 3).reshape(
            tw * nh, gsizes[g], hd
        )
        parts.append(
            jax.lax.dot_general(
                qh, khg,
                dimension_numbers=(((2,), (2,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            )
        )  # (tw*nh, 49, n_g)
    scores = jnp.concatenate(parts, axis=-1).reshape(tw, nh, area, n_total)
    scores = scores + bias[None]
    scores = scores + mask[:, None, None, :]

    # numerically-stable softmax in f32, entirely in VMEM
    m = jnp.max(scores, axis=-1, keepdims=True)
    e = jnp.exp(scores - m)
    p = (e / jnp.sum(e, axis=-1, keepdims=True)).reshape(tw * nh, area, n_total)

    out = jnp.zeros((tw * nh, area, hd), jnp.float32)
    off = 0
    for g in range(num_groups):
        vg = v_refs[g][:]
        vhg = vg.reshape(tw, gsizes[g], nh, hd).transpose(0, 2, 1, 3).reshape(
            tw * nh, gsizes[g], hd
        )
        pg = p[..., off : off + gsizes[g]].astype(vhg.dtype)
        out = out + jax.lax.dot_general(
            pg, vhg,
            dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
        off += gsizes[g]

    out = out.reshape(tw, nh, area, hd).transpose(0, 2, 1, 3).reshape(tw, area, nh * hd)
    o_ref[:] = out.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("nh", "interpret"))
def _cfm_attention_pallas(q, ks, vs, bias, mask, nh: int, interpret: bool = False):
    n_w0, area, c = q.shape
    hd = c // nh
    gsizes = tuple(int(k.shape[1]) for k in ks)
    num_groups = len(ks)
    # Mosaic wants the sublane dim of 2-D blocks 8-aligned: pad the window
    # axis to a multiple of the tile (padded windows attend to zeros with a
    # zero mask — harmless — and are cropped after).
    tw = 8
    n_w = -(-n_w0 // tw) * tw
    if n_w != n_w0:
        pad = [(0, n_w - n_w0)]
        q = jnp.pad(q, pad + [(0, 0), (0, 0)])
        ks = tuple(jnp.pad(k, pad + [(0, 0), (0, 0)]) for k in ks)
        vs = tuple(jnp.pad(v, pad + [(0, 0), (0, 0)]) for v in vs)
        mask = jnp.pad(mask, pad + [(0, 0)])

    grid = (n_w // tw,)
    in_specs = [pl.BlockSpec((tw, area, c), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)]
    for g in gsizes:
        in_specs.append(
            pl.BlockSpec((tw, g, c), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
        )
    for g in gsizes:
        in_specs.append(
            pl.BlockSpec((tw, g, c), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
        )
    in_specs.append(pl.BlockSpec(memory_space=pltpu.VMEM))  # bias (broadcast)
    n_total = sum(gsizes)
    in_specs.append(
        pl.BlockSpec((tw, n_total), lambda i: (i, 0), memory_space=pltpu.VMEM)
    )

    out = pl.pallas_call(
        functools.partial(
            _kernel, num_groups=num_groups, nh=nh, hd=hd, tw=tw, gsizes=gsizes
        ),
        out_shape=jax.ShapeDtypeStruct((n_w, area, c), q.dtype),
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((tw, area, c), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        interpret=interpret,
    )(q, *ks, *vs, bias.astype(jnp.float32), mask.astype(jnp.float32))
    return out[:n_w0]


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


def cfm_attention(q, ks, vs, bias, mask, nh: int, force: str | None = None):
    """force: None (XLA default) | 'pallas' | 'xla' | 'interpret'.

    Default is the XLA formulation: with head_dim 32 (256 dim / 8 heads) the
    per-head matmuls occupy only a quarter of the 128-lane registers and
    Mosaic cannot relayout the head split in-kernel, so the hand-fused
    kernel cannot beat XLA's head-batched einsums on this geometry. The
    Pallas path is kept as an experimental option (and a correctness-tested
    reference for future geometries with head_dim ≥ 128).
    """
    if force == "interpret":
        return _cfm_attention_pallas(q, tuple(ks), tuple(vs), bias, mask, nh, interpret=True)
    if force == "pallas":
        return _cfm_attention_pallas(q, tuple(ks), tuple(vs), bias, mask, nh)
    return _cfm_attention_xla(q, ks, vs, bias, mask, nh)
