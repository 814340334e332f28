"""Fused cross-entropy on bilinearly-upsampled logits — Pallas TPU kernels.

The clip loss (reference ``decode_head.py:743-835``) bilinearly upsamples
(B·T', h, w, C) logits ×4 to label resolution and takes per-pixel CE. Under
XLA this materializes the upsampled f32 tensor (≈0.5 GB/step at the CFFM
train geometry) through HBM several times — measured 13.6 ms of a 57 ms
B=2 train step (fwd+bwd). These kernels compute the per-pixel NLL (and
argmax, for the reference's ``acc_seg``) directly from the low-resolution
logits, and the backward pass accumulates dlogits in VMEM — the ×(s²·C)
blow-up never touches HBM.

Key identity: integer-scale (s) ``align_corners=False`` bilinear upsampling
is *phase-separable* — output pixel (s·k+p) depends only on source pixels
(k+δ_p, k+δ_p+1) with fixed per-phase weights
``d_p = (p+0.5)/s − 0.5;  δ_p = −1 if d_p < 0 else 0;  f_p = d_p − δ_p``
and edge clamping. So the loss factorizes over s² phase images of source
resolution, which is how the kernels iterate (labels are pre-transposed to
phase-major layout; every mean/argmax consumer is permutation-invariant).

API::

    nll_ph, pred_ph = ce_upsampled_nll(logits, labels_ph, scale)
      logits    (N, h, w, C)  f32/bf16
      labels_ph (N, h, s*s, w) int32 — see ``labels_to_phase``
      nll_ph    (N, h, s*s, w) f32 — lse(up) − up[label] per pixel
      pred_ph   (N, h, s*s, w) int32 — argmax (first max, torch tie order)

``ce_upsampled_nll`` carries a custom VJP (grad wrt logits; the backward is
a second Pallas kernel). ``ce_upsampled_nll_xla`` is the identical-math XLA
reference used by the CPU fallback and the parity tests.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .resize import resize_bilinear

__all__ = [
    "labels_to_phase",
    "phase_to_natural",
    "ce_upsampled_nll",
    "ce_upsampled_nll_xla",
    "ce_upsampled_loss",
    "ce_upsampled_loss_xla",
]

_NEG = -1e30  # channel padding: never max, exp underflows to exactly 0


def _phase_coeffs(s: int) -> list[tuple[int, float]]:
    """Per-phase (δ, f): up[s·k+p] = (1−f)·x[k+δ] + f·x[k+δ+1] (edge-clamped)."""
    out = []
    for p in range(s):
        d = (p + 0.5) / s - 0.5
        delta = -1 if d < 0 else 0
        out.append((delta, d - delta))
    return out


def labels_to_phase(labels: jnp.ndarray, s: int) -> jnp.ndarray:
    """(N, H, W) → (N, h, s·s, w), phase = ph·s + pw.

    The phase axis sits *between* the source rows and columns so Pallas can
    block over source rows while the last two dims (s², w) satisfy the TPU
    block-shape rules."""
    n, hh, ww = labels.shape
    h, w = hh // s, ww // s
    x = labels.reshape(n, h, s, w, s)
    return x.transpose(0, 1, 2, 4, 3).reshape(n, h, s * s, w)


def phase_to_natural(x_ph: jnp.ndarray, s: int) -> jnp.ndarray:
    """(N, h, s·s, w) → (N, H, W): inverse of ``labels_to_phase``."""
    n, h, _, w = x_ph.shape
    x = x_ph.reshape(n, h, s, s, w).transpose(0, 1, 2, 4, 3)
    return x.reshape(n, h * s, w * s)


# ---------------------------------------------------------------------------
# forward kernel
# ---------------------------------------------------------------------------


def _shift_w(x, left: bool):
    """Edge-replicated shift along axis 1 (W): left → x[v-1], else x[v+1]."""
    if left:
        return jnp.concatenate([x[:, :1], x[:, :-1]], axis=1)
    return jnp.concatenate([x[:, 1:], x[:, -1:]], axis=1)


def _shift_w_zero(x, left: bool):
    """Zero-filled shift along axis 1: the transpose of ``_shift_w`` minus the
    edge terms (which the backward kernel adds explicitly)."""
    if left:
        return jnp.concatenate([jnp.zeros_like(x[:, :1]), x[:, :-1]], axis=1)
    return jnp.concatenate([x[:, 1:], jnp.zeros_like(x[:, -1:])], axis=1)


def _fwd_kernel(prev_ref, cur_ref, next_ref, lbl_ref, nll_ref, pred_ref, lse_ref,
                *, s: int, ch: int, num_classes: int):
    i = pl.program_id(1)
    g = pl.num_programs(1)
    coeffs = _phase_coeffs(s)

    cur = cur_ref[0].astype(jnp.float32)  # (ch, w, Cp)
    xm1 = jnp.where(i > 0, prev_ref[0, ch - 1].astype(jnp.float32), cur[0])
    xp1 = jnp.where(i < g - 1, next_ref[0, 0].astype(jnp.float32), cur[ch - 1])
    ext = jnp.concatenate([xm1[None], cur, xp1[None]], axis=0)  # (ch+2, w, Cp)

    cp = ext.shape[-1]
    iota_c = jax.lax.broadcasted_iota(jnp.int32, (ch, ext.shape[1], cp), 2)

    for ph, (dh, fh) in enumerate(coeffs):
        # rows for this H phase: lo = ext[1+dh : 1+dh+ch], hi = lo+1
        lo = ext[1 + dh : 1 + dh + ch]
        hi = ext[2 + dh : 2 + dh + ch]
        xh = lo * (1.0 - fh) + hi * fh  # (ch, w, Cp)
        xh_l = _shift_w(xh, left=True)
        xh_r = _shift_w(xh, left=False)
        for pw, (dw, fw) in enumerate(coeffs):
            if dw < 0:
                up = xh_l * (1.0 - fw) + xh * fw
            else:
                up = xh * (1.0 - fw) + xh_r * fw
            m = jnp.max(up, axis=-1, keepdims=True)
            e = jnp.exp(up - m)
            lse = m[..., 0] + jnp.log(jnp.sum(e, axis=-1))
            pidx = ph * s + pw
            # labels arrive i32 or u8 (the loss keeps the phase tensor u8 so
            # the XLA-side transpose runs at 1/4 width); widen in-VMEM
            lbl = lbl_ref[0, :, pidx].astype(jnp.int32)  # (ch, w)
            safe = jnp.where((lbl >= 0) & (lbl < num_classes), lbl, 0)
            picked = jnp.sum(jnp.where(iota_c == safe[..., None], up, 0.0), axis=-1)
            nll_ref[0, :, pidx] = lse - picked
            lse_ref[0, :, pidx] = lse
            # argmax with torch's first-max tie order, as a *float max* reduce:
            # integer min/max lane reductions serialize in Mosaic (measured
            # 12.5 ms of a 14 ms kernel); max(C-1-i over maxima) is free
            rev = jnp.where(up == m, (cp - 1 - iota_c).astype(jnp.float32), -1.0)
            pred_ref[0, :, pidx] = (cp - 1) - jnp.max(rev, axis=-1).astype(jnp.int32)


@functools.partial(jax.jit, static_argnames=("s", "interpret"))
def _ce_fwd_pallas(logits, labels_ph, s: int, interpret: bool = False):
    n, h, w, c = logits.shape
    cp = -(-c // 128) * 128
    if cp != c:
        logits = jnp.pad(logits, ((0, 0),) * 3 + ((0, cp - c),),
                         constant_values=_NEG)
    ch = 8  # measured best on v5e (15-row chunks were ~10% slower)
    while ch > 1 and h % ch:
        ch -= 1
    grid = (n, h // ch)
    view = lambda fix: pl.BlockSpec(
        (1, ch, w, cp), fix, memory_space=pltpu.VMEM)
    g = h // ch
    out_shapes = (
        jax.ShapeDtypeStruct((n, h, s * s, w), jnp.float32),  # nll
        jax.ShapeDtypeStruct((n, h, s * s, w), jnp.int32),    # pred
        jax.ShapeDtypeStruct((n, h, s * s, w), jnp.float32),  # lse (bwd residual)
    )
    out_spec = pl.BlockSpec((1, ch, s * s, w), lambda ni, i: (ni, i, 0, 0),
                            memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_fwd_kernel, s=s, ch=ch, num_classes=c),
        out_shape=out_shapes,
        grid=grid,
        in_specs=[
            view(lambda ni, i: (ni, jnp.maximum(i - 1, 0), 0, 0)),
            view(lambda ni, i: (ni, i, 0, 0)),
            view(lambda ni, i, g=g: (ni, jnp.minimum(i + 1, g - 1), 0, 0)),
            pl.BlockSpec((1, ch, s * s, w), lambda ni, i: (ni, i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(out_spec, out_spec, out_spec),
        interpret=interpret,
    )(logits, logits, logits, labels_ph)


# ---------------------------------------------------------------------------
# backward kernel: dlogits from (g_nll, lse)
# ---------------------------------------------------------------------------


def _bwd_kernel(xprev_ref, xcur_ref, xnext_ref,
                lprev_ref, lcur_ref, lnext_ref,
                sprev_ref, scur_ref, snext_ref,
                gprev_ref, gcur_ref, gnext_ref,
                dx_ref, *, s: int, ch: int, num_classes: int):
    """dx[r] = Σ_phases transpose(W-comb)·transpose(H-comb) of
    t = g · (softmax(up) − onehot(label)).

    Needs t at source rows [K0−1, K0+ch] → recomputes ``up`` on a ±1-row halo.
    Halo views are row slivers, not whole neighbour blocks (the x halo is a
    2-row view, each phase-array halo a 1-row view) — full 3-view blocking
    blew the 16 MB VMEM budget at the train geometry.
    """
    i = pl.program_id(1)
    g = pl.num_programs(1)
    coeffs = _phase_coeffs(s)

    xcur = xcur_ref[0].astype(jnp.float32)  # (ch, w, Cp)
    first = i == 0
    last = i == g - 1
    # x rows [K0-2, K0+ch+2): 2-row sliver views + edge replication
    xm2 = jnp.where(i > 0, xprev_ref[0, 0].astype(jnp.float32), xcur[0])
    xm1 = jnp.where(i > 0, xprev_ref[0, 1].astype(jnp.float32), xcur[0])
    xp1 = jnp.where(i < g - 1, xnext_ref[0, 0].astype(jnp.float32), xcur[ch - 1])
    xp2 = jnp.where(i < g - 1, xnext_ref[0, 1].astype(jnp.float32), xcur[ch - 1])
    xe = jnp.concatenate([xm2[None], xm1[None], xcur, xp1[None], xp2[None]], 0)
    # xe[j] = x[K0-2+j], j ∈ [0, ch+4)

    cp = xe.shape[-1]
    he = ch + 2  # t rows [K0-1, K0+ch+1)
    iota_c = jax.lax.broadcasted_iota(jnp.int32, (he, xe.shape[1], cp), 2)

    dx = jnp.zeros((ch, xe.shape[1], cp), jnp.float32)

    for ph, (dh, fh) in enumerate(coeffs):
        dxh = jnp.zeros((he, xe.shape[1], cp), jnp.float32)
        # up rows k ∈ [K0-1, K0+ch+1): lo = x[k+dh] = xe[k-K0+2+dh]
        lo = xe[1 + dh : 1 + dh + he]
        hi = xe[2 + dh : 2 + dh + he]
        xh = lo * (1.0 - fh) + hi * fh
        xh_l = _shift_w(xh, left=True)
        xh_r = _shift_w(xh, left=False)
        for pw, (dw, fw) in enumerate(coeffs):
            if dw < 0:
                up = xh_l * (1.0 - fw) + xh * fw
            else:
                up = xh * (1.0 - fw) + xh_r * fw
            pidx = ph * s + pw

            def halo(ref_p, ref_c, ref_n):
                a = jnp.where(i > 0, ref_p[0, 0, pidx], ref_c[0, 0, pidx])
                b = jnp.where(i < g - 1, ref_n[0, 0, pidx], ref_c[0, ch - 1, pidx])
                return jnp.concatenate([a[None], ref_c[0, :, pidx], b[None]], 0)

            # halo rows of lse / labels / g_nll; out-of-range halo rows get
            # zero g (they correspond to k outside [0, h) only at the global
            # edges, where no up-row exists)
            gv = halo(gprev_ref, gcur_ref, gnext_ref)  # (he, w)
            # zero the halo rows at the global edges (no up-row exists there);
            # masked elementwise ops — Mosaic has no scatter
            row = jax.lax.broadcasted_iota(jnp.int32, gv.shape, 0)
            gv = jnp.where(first & (row == 0), 0.0, gv)
            gv = jnp.where(last & (row == he - 1), 0.0, gv)
            lse = halo(sprev_ref, scur_ref, snext_ref)
            lbl = halo(lprev_ref, lcur_ref, lnext_ref).astype(jnp.int32)
            safe = jnp.where((lbl >= 0) & (lbl < num_classes), lbl, 0)

            sm = jnp.exp(up - lse[..., None])
            onehot = (iota_c == safe[..., None]).astype(jnp.float32)
            t = gv[..., None] * (sm - onehot)  # (he, w, Cp)

            # --- transpose of the W combination -------------------------
            col = jax.lax.broadcasted_iota(jnp.int32, t.shape, 1)
            wlen = t.shape[1]
            if dw < 0:
                # up[v] = (1-fw)·Xw[v-1] + fw·Xw[v]; dXw[u] = (1-fw)·t[u+1] + fw·t[u]
                dW = _shift_w_zero(t, left=False) * (1.0 - fw) + t * fw
                # edge fold: dXw[-1] = (1-fw)·t[:,0] lands on col 0
                dW = dW + jnp.where(col == 0, (1.0 - fw) * t, 0.0)
            else:
                # up[v] = (1-fw)·Xw[v] + fw·Xw[v+1]; dXw[u] = (1-fw)·t[u] + fw·t[u-1]
                dW = t * (1.0 - fw) + _shift_w_zero(t, left=True) * fw
                # edge fold: dXw[w] = fw·t[:,w-1] lands on col w-1
                dW = dW + jnp.where(col == wlen - 1, fw * t, 0.0)
            dxh = dxh + dW
        # --- transpose of the H combination -----------------------------
        # up[k] = (1-fh)·Xh[k+dh] + fh·Xh[k+dh+1]; dxh rows are t-rows
        # k ∈ [K0-1, K0+ch+1). dXh[j] = (1-fh)·dxh[j-dh] + fh·dxh[j-dh-1]
        # with dxh index base K0-1: row for k is dxh[k-K0+1].
        # For j ∈ [K0, K0+ch): j-dh -> dxh[j-K0+1-dh], j-dh-1 -> dxh[j-K0-dh]
        a = dxh[1 - dh : 1 - dh + ch]      # t[j - dh]
        b = dxh[-dh : -dh + ch]            # t[j - dh - 1]
        contrib = a * (1.0 - fh) + b * fh
        # global edges: dXh[-1] = (1-fh)·t[-1+ -dh ...] only for dh = -1:
        #   dXh[-1] = (1-fh)·t[0]  (k = -1+... wait: k = j - dh = -1+1 = 0)
        rowc = jax.lax.broadcasted_iota(jnp.int32, contrib.shape, 0)
        if dh < 0:
            # dXh[-1] = (1-fh)·t[k=0]; t[k=0] = dxh[1] — folds onto row 0
            contrib = contrib + jnp.where(
                first & (rowc == 0), (1.0 - fh) * dxh[1][None], 0.0)
        else:
            # dXh[h] = fh·t[k=h-1]; t[k=h-1] = dxh[ch] — folds onto row h-1
            contrib = contrib + jnp.where(
                last & (rowc == ch - 1), fh * dxh[ch][None], 0.0)
        dx = dx + contrib

    dx_ref[0] = dx.astype(dx_ref.dtype)


@functools.partial(jax.jit, static_argnames=("s", "c", "interpret"))
def _ce_bwd_pallas(logits, labels_ph, lse_ph, g_nll, s: int, c: int,
                   interpret: bool = False):
    n, h, w, _ = logits.shape
    cp = -(-c // 128) * 128
    if cp != c:
        logits = jnp.pad(logits, ((0, 0),) * 3 + ((0, cp - c),),
                         constant_values=_NEG)
    ch = 8  # larger chunks blow the 16 MB VMEM budget in this kernel
    while ch > 1 and (h % ch or ch % 2):
        ch -= 1
    assert ch >= 2, "backward kernel needs an even row-chunk divisor of h"
    grid = (n, h // ch)
    g = h // ch
    h2 = h // 2
    # current block + 2-row (x) / 1-row (phase) halo slivers
    xcurv = pl.BlockSpec((1, ch, w, cp), lambda ni, i: (ni, i, 0, 0),
                         memory_space=pltpu.VMEM)
    xprevv = pl.BlockSpec(
        (1, 2, w, cp),
        lambda ni, i, ch=ch: (ni, jnp.maximum(i * (ch // 2) - 1, 0), 0, 0),
        memory_space=pltpu.VMEM)
    xnextv = pl.BlockSpec(
        (1, 2, w, cp),
        lambda ni, i, ch=ch, h2=h2: (ni, jnp.minimum((i + 1) * (ch // 2), h2 - 1), 0, 0),
        memory_space=pltpu.VMEM)
    pcurv = pl.BlockSpec((1, ch, s * s, w), lambda ni, i: (ni, i, 0, 0),
                         memory_space=pltpu.VMEM)
    pprevv = pl.BlockSpec(
        (1, 1, s * s, w),
        lambda ni, i, ch=ch: (ni, jnp.maximum(i * ch - 1, 0), 0, 0),
        memory_space=pltpu.VMEM)
    pnextv = pl.BlockSpec(
        (1, 1, s * s, w),
        lambda ni, i, ch=ch, h=h: (ni, jnp.minimum((i + 1) * ch, h - 1), 0, 0),
        memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_bwd_kernel, s=s, ch=ch, num_classes=c),
        out_shape=jax.ShapeDtypeStruct((n, h, w, cp), jnp.float32),
        grid=grid,
        in_specs=[
            xprevv, xcurv, xnextv,
            pprevv, pcurv, pnextv,
            pprevv, pcurv, pnextv,
            pprevv, pcurv, pnextv,
        ],
        out_specs=pl.BlockSpec((1, ch, w, cp), lambda ni, i: (ni, i, 0, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(logits, logits, logits,
      labels_ph, labels_ph, labels_ph,
      lse_ph, lse_ph, lse_ph,
      g_nll, g_nll, g_nll)
    return out[..., :c]


# ---------------------------------------------------------------------------
# v2: fully-reduced loss kernels (no per-pixel HBM intermediates)
# ---------------------------------------------------------------------------
#
# The v1 kernels above emit per-pixel nll/pred/lse maps — three (N, h, s², w)
# f32 arrays ≈ 350 MB each at the B=8 train geometry — which XLA then masks
# and mean-reduces, and whose cotangent (g_nll) plus lse make two more full
# passes in the backward. For the *default* loss config (no OHEM) none of
# those maps is needed: the loss is a weighted sum with a per-segment
# *static* weight, and acc_seg is a correct-pixel count. ``ce_upsampled_loss``
# computes both as per-block partial sums inside the forward kernel (the only
# HBM traffic is reading the low-res logits + labels), and its backward
# kernel recomputes lse on the fly and builds the per-pixel cotangent from
# the labels + the scalar upstream gradient — the (N, h, s², w) maps never
# exist. The argmax lane-pass is likewise dropped: a pixel is counted
# correct iff it is valid and its label's upsampled logit equals the row max
# (exact float ties — where torch's first-max order could disagree — do not
# occur with real-valued logits; the _NEG channel padding never ties).


def _fwd_loss_kernel(prev_ref, cur_ref, next_ref, lbl_ref, wsum_ref, corr_ref,
                     *, s: int, ch: int, num_classes: int, img_w: float,
                     count_acc: bool):
    i = pl.program_id(1)
    g = pl.num_programs(1)
    coeffs = _phase_coeffs(s)

    cur = cur_ref[0].astype(jnp.float32)  # (ch, w, Cp)
    xm1 = jnp.where(i > 0, prev_ref[0, ch - 1].astype(jnp.float32), cur[0])
    xp1 = jnp.where(i < g - 1, next_ref[0, 0].astype(jnp.float32), cur[ch - 1])
    ext = jnp.concatenate([xm1[None], cur, xp1[None]], axis=0)  # (ch+2, w, Cp)

    cp = ext.shape[-1]
    wlen = ext.shape[1]
    iota_c = jax.lax.broadcasted_iota(jnp.int32, (ch, wlen, cp), 2)

    tot = jnp.zeros((ch, wlen), jnp.float32)
    cor = jnp.zeros((ch, wlen), jnp.float32)
    for ph, (dh, fh) in enumerate(coeffs):
        lo = ext[1 + dh : 1 + dh + ch]
        hi = ext[2 + dh : 2 + dh + ch]
        xh = lo * (1.0 - fh) + hi * fh  # (ch, w, Cp)
        xh_l = _shift_w(xh, left=True)
        xh_r = _shift_w(xh, left=False)
        for pw, (dw, fw) in enumerate(coeffs):
            if dw < 0:
                up = xh_l * (1.0 - fw) + xh * fw
            else:
                up = xh * (1.0 - fw) + xh_r * fw
            m = jnp.max(up, axis=-1, keepdims=True)
            e = jnp.exp(up - m)
            lse = m[..., 0] + jnp.log(jnp.sum(e, axis=-1))
            lbl = lbl_ref[0, :, ph * s + pw].astype(jnp.int32)  # (ch, w)
            valid = (lbl >= 0) & (lbl < num_classes)
            safe = jnp.where(valid, lbl, 0)
            # label pick as a masked MAX, not a masked sum: exactly one lane
            # survives the mask so max ≡ sum — and Mosaic's lane-max is ~5×
            # cheaper than its lane-sum (round-5 probe: 0.04 vs 0.22 ms per
            # (32,120,120,128) pass; two sums per phase were ~7 ms of the
            # 11 ms forward)
            picked = jnp.max(jnp.where(iota_c == safe[..., None], up, _NEG),
                             axis=-1)
            tot = tot + jnp.where(valid, lse - picked, 0.0)
            if count_acc:
                cor = cor + jnp.where(valid & (picked == m[..., 0]), 1.0, 0.0)
    # (ch, w) partial maps, summed by XLA outside (scalar-block outputs are
    # not expressible on TPU: last-two block dims must be (8k, 128k) or full)
    wsum_ref[0, 0] = tot * img_w
    corr_ref[0, 0] = cor


@functools.partial(jax.jit, static_argnames=("s", "img_w", "count_acc", "ch",
                                             "interpret"))
def _ce_fwd_loss_pallas(logits, labels_ph, s: int, img_w: float,
                        count_acc: bool = True, ch: int = 4,
                        interpret: bool = False):
    n, h, w, c = logits.shape
    cp = -(-c // 128) * 128
    if cp != c:
        logits = jnp.pad(logits, ((0, 0),) * 3 + ((0, cp - c),),
                         constant_values=_NEG)
    # ch=4 measured best; larger chunks need the raised scoped-VMEM ceiling
    # (the fully-unrolled phase loop keeps ~16 live sets) and measured no
    # faster (tools/bench_ce.py)
    while ch > 1 and h % ch:
        ch -= 1
    grid = (n, h // ch)
    g = h // ch
    view = lambda fix: pl.BlockSpec((1, ch, w, cp), fix, memory_space=pltpu.VMEM)
    scalar_spec = pl.BlockSpec((1, 1, ch, w), lambda ni, i: (ni, i, 0, 0),
                               memory_space=pltpu.VMEM)
    wsum, corr = pl.pallas_call(
        functools.partial(_fwd_loss_kernel, s=s, ch=ch, num_classes=c,
                          img_w=img_w, count_acc=count_acc),
        out_shape=(
            jax.ShapeDtypeStruct((n, g, ch, w), jnp.float32),
            jax.ShapeDtypeStruct((n, g, ch, w), jnp.float32),
        ),
        grid=grid,
        in_specs=[
            view(lambda ni, i: (ni, jnp.maximum(i - 1, 0), 0, 0)),
            view(lambda ni, i: (ni, i, 0, 0)),
            view(lambda ni, i, g=g: (ni, jnp.minimum(i + 1, g - 1), 0, 0)),
            pl.BlockSpec((1, ch, s * s, w), lambda ni, i: (ni, i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(scalar_spec, scalar_spec),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=40 << 20),
        interpret=interpret,
    )(logits, logits, logits, labels_ph)
    return jnp.sum(wsum), jnp.sum(corr)


def _bwd_loss_kernel(xprev_ref, xcur_ref, xnext_ref,
                     lprev_ref, lcur_ref, lnext_ref, ct_ref,
                     dx_ref, *, s: int, ch: int, num_classes: int, img_w: float):
    """dx = ct · img_w · Σ_phases transposes of valid·(softmax(up) − onehot).

    Identical transpose structure to ``_bwd_kernel`` but lse is recomputed
    from the logits (max/exp/sum per phase) and the per-pixel cotangent is
    built from the labels + the scalar upstream ct — no per-pixel residual
    or cotangent arrays are read from HBM.
    """
    i = pl.program_id(1)
    g = pl.num_programs(1)
    coeffs = _phase_coeffs(s)
    ct = ct_ref[0, 0] * img_w

    xcur = xcur_ref[0].astype(jnp.float32)  # (ch, w, Cp)
    first = i == 0
    last = i == g - 1
    xm2 = jnp.where(i > 0, xprev_ref[0, 0].astype(jnp.float32), xcur[0])
    xm1 = jnp.where(i > 0, xprev_ref[0, 1].astype(jnp.float32), xcur[0])
    xp1 = jnp.where(i < g - 1, xnext_ref[0, 0].astype(jnp.float32), xcur[ch - 1])
    xp2 = jnp.where(i < g - 1, xnext_ref[0, 1].astype(jnp.float32), xcur[ch - 1])
    xe = jnp.concatenate([xm2[None], xm1[None], xcur, xp1[None], xp2[None]], 0)

    cp = xe.shape[-1]
    he = ch + 2
    iota_c = jax.lax.broadcasted_iota(jnp.int32, (he, xe.shape[1], cp), 2)

    dx = jnp.zeros((ch, xe.shape[1], cp), jnp.float32)

    for ph, (dh, fh) in enumerate(coeffs):
        dxh = jnp.zeros((he, xe.shape[1], cp), jnp.float32)
        lo = xe[1 + dh : 1 + dh + he]
        hi = xe[2 + dh : 2 + dh + he]
        xh = lo * (1.0 - fh) + hi * fh
        xh_l = _shift_w(xh, left=True)
        xh_r = _shift_w(xh, left=False)
        for pw, (dw, fw) in enumerate(coeffs):
            if dw < 0:
                up = xh_l * (1.0 - fw) + xh * fw
            else:
                up = xh * (1.0 - fw) + xh_r * fw
            pidx = ph * s + pw

            def halo(ref_p, ref_c, ref_n):
                a = jnp.where(i > 0, ref_p[0, 0, pidx], ref_c[0, 0, pidx])
                b = jnp.where(i < g - 1, ref_n[0, 0, pidx], ref_c[0, ch - 1, pidx])
                return jnp.concatenate([a[None], ref_c[0, :, pidx], b[None]], 0)

            lbl = halo(lprev_ref, lcur_ref, lnext_ref).astype(jnp.int32)  # (he, w)
            valid = (lbl >= 0) & (lbl < num_classes)
            safe = jnp.where(valid, lbl, 0)
            gv = jnp.where(valid, ct, 0.0)
            row = jax.lax.broadcasted_iota(jnp.int32, gv.shape, 0)
            gv = jnp.where(first & (row == 0), 0.0, gv)
            gv = jnp.where(last & (row == he - 1), 0.0, gv)

            # recompute the softmax (the v1 kernel read lse from HBM).
            # (A "folded" t = e·(gv/Σe) with a select-subtract on the label
            # lane measured 14.2 → 18.9 ms — Mosaic fuses this chain better
            # than the hand-folded one; keep the straight form.)
            m = jnp.max(up, axis=-1, keepdims=True)
            e = jnp.exp(up - m)
            sm = e / jnp.sum(e, axis=-1, keepdims=True)
            onehot = (iota_c == safe[..., None]).astype(jnp.float32)
            t = gv[..., None] * (sm - onehot)  # (he, w, Cp)

            col = jax.lax.broadcasted_iota(jnp.int32, t.shape, 1)
            wlen = t.shape[1]
            if dw < 0:
                dW = _shift_w_zero(t, left=False) * (1.0 - fw) + t * fw
                dW = dW + jnp.where(col == 0, (1.0 - fw) * t, 0.0)
            else:
                dW = t * (1.0 - fw) + _shift_w_zero(t, left=True) * fw
                dW = dW + jnp.where(col == wlen - 1, fw * t, 0.0)
            dxh = dxh + dW
        a = dxh[1 - dh : 1 - dh + ch]
        b = dxh[-dh : -dh + ch]
        contrib = a * (1.0 - fh) + b * fh
        rowc = jax.lax.broadcasted_iota(jnp.int32, contrib.shape, 0)
        if dh < 0:
            contrib = contrib + jnp.where(
                first & (rowc == 0), (1.0 - fh) * dxh[1][None], 0.0)
        else:
            contrib = contrib + jnp.where(
                last & (rowc == ch - 1), fh * dxh[ch][None], 0.0)
        dx = dx + contrib

    dx_ref[0] = dx.astype(dx_ref.dtype)


@functools.partial(jax.jit, static_argnames=("s", "c", "img_w", "interpret"))
def _ce_bwd_loss_pallas(logits, labels_ph, ct, s: int, c: int, img_w: float,
                        interpret: bool = False):
    n, h, w, _ = logits.shape
    cp = -(-c // 128) * 128
    if cp != c:
        logits = jnp.pad(logits, ((0, 0),) * 3 + ((0, cp - c),),
                         constant_values=_NEG)
    # ch=4 (vs the v1 backward's 8): recomputing the softmax in-kernel adds
    # (up, e, sm)-sized live ranges — ch=8 hits 24M > 16M VMEM stack at the
    # train geometry
    ch = 4
    while ch > 1 and (h % ch or ch % 2):
        ch -= 1
    assert ch >= 2, "backward kernel needs an even row-chunk divisor of h"
    grid = (n, h // ch)
    g = h // ch
    h2 = h // 2
    xcurv = pl.BlockSpec((1, ch, w, cp), lambda ni, i: (ni, i, 0, 0),
                         memory_space=pltpu.VMEM)
    xprevv = pl.BlockSpec(
        (1, 2, w, cp),
        lambda ni, i, ch=ch: (ni, jnp.maximum(i * (ch // 2) - 1, 0), 0, 0),
        memory_space=pltpu.VMEM)
    xnextv = pl.BlockSpec(
        (1, 2, w, cp),
        lambda ni, i, ch=ch, h2=h2: (ni, jnp.minimum((i + 1) * (ch // 2), h2 - 1), 0, 0),
        memory_space=pltpu.VMEM)
    pcurv = pl.BlockSpec((1, ch, s * s, w), lambda ni, i: (ni, i, 0, 0),
                         memory_space=pltpu.VMEM)
    pprevv = pl.BlockSpec(
        (1, 1, s * s, w),
        lambda ni, i, ch=ch: (ni, jnp.maximum(i * ch - 1, 0), 0, 0),
        memory_space=pltpu.VMEM)
    pnextv = pl.BlockSpec(
        (1, 1, s * s, w),
        lambda ni, i, ch=ch, h=h: (ni, jnp.minimum((i + 1) * ch, h - 1), 0, 0),
        memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_bwd_loss_kernel, s=s, ch=ch, num_classes=c,
                          img_w=img_w),
        out_shape=jax.ShapeDtypeStruct((n, h, w, cp), jnp.float32),
        grid=grid,
        in_specs=[
            xprevv, xcurv, xnextv,
            pprevv, pcurv, pnextv,
            pl.BlockSpec((1, 1), lambda ni, i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, ch, w, cp), lambda ni, i: (ni, i, 0, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(logits, logits, logits,
      labels_ph, labels_ph, labels_ph,
      ct.astype(jnp.float32).reshape(1, 1))
    return out[..., :c]


# ---------------------------------------------------------------------------
# v3: layout-aligned loss kernels
# ---------------------------------------------------------------------------
#
# The v2 kernels above are algorithmically right (nothing pixel-sized touches
# HBM) but were measured at 30 ms fwd+bwd of the B=8 480² train step — ~8×
# their op-count roofline (round-5 profile). Two Mosaic pathologies explain
# it, both per phase × per program:
#   (a) every (ch, w)-shaped value (labels, lse, picked, masks, accumulators)
#       is rank-2 with w in LANES, while the (ch, w, Cp) class math keeps w
#       in SUBLANES — each `safe[..., None] == iota_c` / `gv[..., None] * t`
#       broadcast is a full w↔lane relayout (per-element shuffles);
#   (b) `_shift_w` builds shifted maps with misaligned sublane slice+concat
#       copies — the exact pattern the dwconv kernel notes call out as
#       "forced misaligned retiling" (its fix, `pltpu.roll`, is ~free).
# v3 keeps EVERYTHING rank-3 with w in sublanes (labels arrive w-major as
# (N, h, w, s²) so a phase slice is a lane pick, reductions keep dims, the
# partial-sum outputs are (N, h, w, 1) blocks), and does the W shifts as
# sublane rolls with iota-select edge fixes. Same math to the last ulp:
# the phase/select/lse structure is untouched.


def labels_to_phase_w(labels: jnp.ndarray, s: int) -> jnp.ndarray:
    """(N, H, W) → (N, h, w, s·s), phase = ph·s + pw (w-major twin of
    ``labels_to_phase``: [n, k, v, ph·s+pw] = labels[n, s·k+ph, s·v+pw])."""
    n, hh, ww = labels.shape
    h, w = hh // s, ww // s
    x = labels.reshape(n, h, s, w, s)
    return x.transpose(0, 1, 3, 2, 4).reshape(n, h, w, s * s)


def _sl_shift(x, down: bool):
    """Edge-replicated shift along sublane axis 1 of rank-3 x (f32).

    down: out[:, v] = x[:, v−1] (edge v=0 keeps x[:, 0]); else out[:, v] =
    x[:, v+1] (edge v=n−1 keeps x[:, n−1]). ``pltpu.roll`` + iota select —
    never a misaligned sublane slice."""
    n = x.shape[1]
    row = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    if down:
        return jnp.where(row == 0, x, pltpu.roll(x, 1, 1))
    return jnp.where(row == n - 1, x, pltpu.roll(x, n - 1, 1))


def _sl_shift_zero(x, down: bool):
    """Zero-filled sublane shift (transpose of ``_sl_shift`` minus edges)."""
    n = x.shape[1]
    row = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    if down:
        return jnp.where(row == 0, 0.0, pltpu.roll(x, 1, 1))
    return jnp.where(row == n - 1, 0.0, pltpu.roll(x, n - 1, 1))


def _fwd_loss_kernel5(prev_ref, cur_ref, next_ref, lbl_ref, wsum_ref, corr_ref,
                      *, s: int, ch: int, num_classes: int, img_w: float,
                      count_acc: bool):
    """v5 = the v2 unrolled structure with ONLY the label machinery
    layout-aligned: labels arrive w-major (N, h, w, s²) so a phase slice is
    a static (ch, w, 1) lane slice, every (ch, w)-shaped value keeps a
    trailing lane dim, and the partial sums write as (1, ch, w, 1) blocks.
    The round-5 bisect priced the v2 label path (w-in-lanes 2-D labels
    broadcast against the w-in-sublanes class grid — a relayout per phase)
    at ~4.3 ms of the 11 ms forward; the v3 rewrite fixed that but buried
    the win under fori-loop/roll-shift regressions."""
    i = pl.program_id(1)
    g = pl.num_programs(1)
    coeffs = _phase_coeffs(s)

    cur = cur_ref[0].astype(jnp.float32)  # (ch, w, Cp)
    xm1 = jnp.where(i > 0, prev_ref[0, ch - 1].astype(jnp.float32), cur[0])
    xp1 = jnp.where(i < g - 1, next_ref[0, 0].astype(jnp.float32), cur[ch - 1])
    ext = jnp.concatenate([xm1[None], cur, xp1[None]], axis=0)  # (ch+2, w, Cp)

    cp = ext.shape[-1]
    wlen = ext.shape[1]
    iota_c = jax.lax.broadcasted_iota(jnp.int32, (ch, wlen, cp), 2)
    lbl_all = lbl_ref[0].astype(jnp.int32)  # (ch, w, s²)

    tot = jnp.zeros((ch, wlen, 1), jnp.float32)
    cor = jnp.zeros((ch, wlen, 1), jnp.float32)
    for ph, (dh, fh) in enumerate(coeffs):
        lo = ext[1 + dh : 1 + dh + ch]
        hi = ext[2 + dh : 2 + dh + ch]
        xh = lo * (1.0 - fh) + hi * fh  # (ch, w, Cp)
        xh_l = _shift_w(xh, left=True)
        xh_r = _shift_w(xh, left=False)
        for pw, (dw, fw) in enumerate(coeffs):
            if dw < 0:
                up = xh_l * (1.0 - fw) + xh * fw
            else:
                up = xh * (1.0 - fw) + xh_r * fw
            m = jnp.max(up, axis=-1, keepdims=True)  # (ch, w, 1)
            e = jnp.exp(up - m)
            lse = m + jnp.log(jnp.sum(e, axis=-1, keepdims=True))
            pidx = ph * s + pw
            lbl = lbl_all[:, :, pidx : pidx + 1]  # (ch, w, 1), static slice
            valid = (lbl >= 0) & (lbl < num_classes)
            safe = jnp.where(valid, lbl, 0)
            picked = jnp.max(jnp.where(iota_c == safe, up, _NEG), axis=-1,
                             keepdims=True)
            tot = tot + jnp.where(valid, lse - picked, 0.0)
            if count_acc:
                cor = cor + jnp.where(valid & (picked == m), 1.0, 0.0)
    wsum_ref[0] = tot * img_w
    corr_ref[0] = cor


@functools.partial(jax.jit, static_argnames=("s", "img_w", "count_acc", "ch",
                                             "interpret"))
def _ce_fwd_loss_pallas5(logits, labels_phw, s: int, img_w: float,
                         count_acc: bool = True, ch: int = 4,
                         interpret: bool = False):
    """labels_phw (N, h, w, s²) w-major — see ``labels_to_phase_w``."""
    n, h, w, c = logits.shape
    cp = -(-c // 128) * 128
    if cp != c:
        logits = jnp.pad(logits, ((0, 0),) * 3 + ((0, cp - c),),
                         constant_values=_NEG)
    while ch > 1 and h % ch:
        ch -= 1
    grid = (n, h // ch)
    g = h // ch
    view = lambda fix: pl.BlockSpec((1, ch, w, cp), fix, memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((1, ch, w, 1), lambda ni, i: (ni, i, 0, 0),
                            memory_space=pltpu.VMEM)
    wsum, corr = pl.pallas_call(
        functools.partial(_fwd_loss_kernel5, s=s, ch=ch, num_classes=c,
                          img_w=img_w, count_acc=count_acc),
        out_shape=(
            jax.ShapeDtypeStruct((n, h, w, 1), jnp.float32),
            jax.ShapeDtypeStruct((n, h, w, 1), jnp.float32),
        ),
        grid=grid,
        in_specs=[
            view(lambda ni, i: (ni, jnp.maximum(i - 1, 0), 0, 0)),
            view(lambda ni, i: (ni, i, 0, 0)),
            view(lambda ni, i, g=g: (ni, jnp.minimum(i + 1, g - 1), 0, 0)),
            pl.BlockSpec((1, ch, w, s * s), lambda ni, i: (ni, i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(out_spec, out_spec),
        interpret=interpret,
    )(logits, logits, logits, labels_phw)
    return jnp.sum(wsum), jnp.sum(corr)


def _bwd_loss_kernel5(xprev_ref, xcur_ref, xnext_ref,
                      lprev_ref, lcur_ref, lnext_ref, ct_ref,
                      dx_ref, *, s: int, ch: int, num_classes: int,
                      img_w: float):
    """v5 backward: the v2 structure with the label/cotangent chain rank-3
    (w-major labels, static lane slices) — see ``_fwd_loss_kernel5``."""
    i = pl.program_id(1)
    g = pl.num_programs(1)
    coeffs = _phase_coeffs(s)
    ct = ct_ref[0, 0] * img_w

    xcur = xcur_ref[0].astype(jnp.float32)  # (ch, w, Cp)
    first = i == 0
    last = i == g - 1
    xm2 = jnp.where(i > 0, xprev_ref[0, 0].astype(jnp.float32), xcur[0])
    xm1 = jnp.where(i > 0, xprev_ref[0, 1].astype(jnp.float32), xcur[0])
    xp1 = jnp.where(i < g - 1, xnext_ref[0, 0].astype(jnp.float32), xcur[ch - 1])
    xp2 = jnp.where(i < g - 1, xnext_ref[0, 1].astype(jnp.float32), xcur[ch - 1])
    xe = jnp.concatenate([xm2[None], xm1[None], xcur, xp1[None], xp2[None]], 0)

    cp = xe.shape[-1]
    wlen = xe.shape[1]
    he = ch + 2
    iota_c = jax.lax.broadcasted_iota(jnp.int32, (he, wlen, cp), 2)
    ltop = jnp.where(i > 0, lprev_ref[0, 0], lcur_ref[0, 0])
    lbot = jnp.where(i < g - 1, lnext_ref[0, 0], lcur_ref[0, ch - 1])
    lbl_halo = jnp.concatenate([ltop[None], lcur_ref[0], lbot[None]],
                               0).astype(jnp.int32)  # (he, w, s²)
    rowg = jax.lax.broadcasted_iota(jnp.int32, (he, wlen, 1), 0)
    edge_row = (first & (rowg == 0)) | (last & (rowg == he - 1))

    dx = jnp.zeros((ch, wlen, cp), jnp.float32)

    for ph, (dh, fh) in enumerate(coeffs):
        dxh = jnp.zeros((he, wlen, cp), jnp.float32)
        lo = xe[1 + dh : 1 + dh + he]
        hi = xe[2 + dh : 2 + dh + he]
        xh = lo * (1.0 - fh) + hi * fh
        xh_l = _shift_w(xh, left=True)
        xh_r = _shift_w(xh, left=False)
        for pw, (dw, fw) in enumerate(coeffs):
            if dw < 0:
                up = xh_l * (1.0 - fw) + xh * fw
            else:
                up = xh * (1.0 - fw) + xh_r * fw
            pidx = ph * s + pw

            lbl = lbl_halo[:, :, pidx : pidx + 1]  # (he, w, 1)
            valid = (lbl >= 0) & (lbl < num_classes)
            safe = jnp.where(valid, lbl, 0)
            gv = jnp.where(valid & ~edge_row, ct, 0.0)  # (he, w, 1)

            m = jnp.max(up, axis=-1, keepdims=True)
            e = jnp.exp(up - m)
            sm = e / jnp.sum(e, axis=-1, keepdims=True)
            onehot = (iota_c == safe).astype(jnp.float32)
            t = gv * (sm - onehot)  # (he, w, Cp)

            col = jax.lax.broadcasted_iota(jnp.int32, t.shape, 1)
            if dw < 0:
                dW = _shift_w_zero(t, left=False) * (1.0 - fw) + t * fw
                dW = dW + jnp.where(col == 0, (1.0 - fw) * t, 0.0)
            else:
                dW = t * (1.0 - fw) + _shift_w_zero(t, left=True) * fw
                dW = dW + jnp.where(col == wlen - 1, fw * t, 0.0)
            dxh = dxh + dW
        a = dxh[1 - dh : 1 - dh + ch]
        b = dxh[-dh : -dh + ch]
        contrib = a * (1.0 - fh) + b * fh
        rowc = jax.lax.broadcasted_iota(jnp.int32, contrib.shape, 0)
        if dh < 0:
            contrib = contrib + jnp.where(
                first & (rowc == 0), (1.0 - fh) * dxh[1][None], 0.0)
        else:
            contrib = contrib + jnp.where(
                last & (rowc == ch - 1), fh * dxh[ch][None], 0.0)
        dx = dx + contrib

    dx_ref[0] = dx.astype(dx_ref.dtype)


@functools.partial(jax.jit, static_argnames=("s", "c", "img_w", "ch",
                                             "interpret"))
def _ce_bwd_loss_pallas5(logits, labels_phw, ct, s: int, c: int, img_w: float,
                         ch: int = 12, interpret: bool = False):
    # ch=12 under the 40 MB scoped ceiling: 12.8 → 11.4 ms at the B=8 train
    # geometry (tools/bench_ce.py ch sweep); falls back to smaller even
    # divisors of h automatically
    n, h, w, _ = logits.shape
    cp = -(-c // 128) * 128
    if cp != c:
        logits = jnp.pad(logits, ((0, 0),) * 3 + ((0, cp - c),),
                         constant_values=_NEG)
    while ch > 1 and (h % ch or ch % 2):
        ch -= 1
    assert ch >= 2, "backward kernel needs an even row-chunk divisor of h"
    grid = (n, h // ch)
    g = h // ch
    h2 = h // 2
    xcurv = pl.BlockSpec((1, ch, w, cp), lambda ni, i: (ni, i, 0, 0),
                         memory_space=pltpu.VMEM)
    xprevv = pl.BlockSpec(
        (1, 2, w, cp),
        lambda ni, i, ch=ch: (ni, jnp.maximum(i * (ch // 2) - 1, 0), 0, 0),
        memory_space=pltpu.VMEM)
    xnextv = pl.BlockSpec(
        (1, 2, w, cp),
        lambda ni, i, ch=ch, h2=h2: (ni, jnp.minimum((i + 1) * (ch // 2), h2 - 1), 0, 0),
        memory_space=pltpu.VMEM)
    pcurv = pl.BlockSpec((1, ch, w, s * s), lambda ni, i: (ni, i, 0, 0),
                         memory_space=pltpu.VMEM)
    pprevv = pl.BlockSpec(
        (1, 1, w, s * s),
        lambda ni, i, ch=ch: (ni, jnp.maximum(i * ch - 1, 0), 0, 0),
        memory_space=pltpu.VMEM)
    pnextv = pl.BlockSpec(
        (1, 1, w, s * s),
        lambda ni, i, ch=ch, h=h: (ni, jnp.minimum((i + 1) * ch, h - 1), 0, 0),
        memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_bwd_loss_kernel5, s=s, ch=ch, num_classes=c,
                          img_w=img_w),
        out_shape=jax.ShapeDtypeStruct((n, h, w, cp), jnp.float32),
        grid=grid,
        in_specs=[
            xprevv, xcurv, xnextv,
            pprevv, pcurv, pnextv,
            pl.BlockSpec((1, 1), lambda ni, i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, ch, w, cp), lambda ni, i: (ni, i, 0, 0),
                               memory_space=pltpu.VMEM),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=40 << 20),
        interpret=interpret,
    )(logits, logits, logits,
      labels_phw, labels_phw, labels_phw,
      ct.astype(jnp.float32).reshape(1, 1))
    return out[..., :c]


def _phase_coeff_dyn(p, s: int):
    """(δ, f) of ``_phase_coeffs`` from a *traced* phase index (loop var)."""
    d = (p.astype(jnp.float32) + 0.5) / s - 0.5
    delta = jnp.where(d < 0.0, -1, 0)
    return delta, d - delta.astype(jnp.float32)


def _lane_pick(x3, idx):
    """(r, w, L) → (r, w, 1): lane ``idx`` (traced scalar) via masked reduce —
    dynamic lane slicing is not lane-aligned, a 16-lane masked sum is free."""
    lane = jax.lax.broadcasted_iota(jnp.int32, x3.shape, 2)
    return jnp.sum(jnp.where(lane == idx, x3, 0), axis=-1, keepdims=True)


def _fwd_loss_kernel3(prev_ref, cur_ref, next_ref, lbl_ref, wsum_ref, corr_ref,
                      *, s: int, ch: int, num_classes: int, img_w: float,
                      count_acc: bool):
    """Phases run as nested ``fori_loop``s (uniform coefficient arithmetic
    from the loop index) so one phase's temporaries are reused by the next —
    the fully-unrolled v2 form kept ~16 phase live-sets on the Mosaic stack,
    capping the row chunk at 4 and the occupancy with it."""
    i = pl.program_id(1)
    g = pl.num_programs(1)

    cur = cur_ref[0].astype(jnp.float32)  # (ch, w, Cp)
    xm1 = jnp.where(i > 0, prev_ref[0, ch - 1].astype(jnp.float32), cur[0])
    xp1 = jnp.where(i < g - 1, next_ref[0, 0].astype(jnp.float32), cur[ch - 1])
    ext = jnp.concatenate([xm1[None], cur, xp1[None]], axis=0)  # (ch+2, w, Cp)

    cp = ext.shape[-1]
    wlen = ext.shape[1]
    iota_c = jax.lax.broadcasted_iota(jnp.int32, (ch, wlen, cp), 2)
    lbl_all = lbl_ref[0].astype(jnp.int32)  # (ch, w, s²)

    def w_body(pw, carry):
        tot, cor, xh, xh_l, xh_r, ph = carry
        dw, fw = _phase_coeff_dyn(pw, s)
        neg = dw < 0
        wl = jnp.where(neg, 1.0 - fw, 0.0)
        wm = jnp.where(neg, fw, 1.0 - fw)
        wr = jnp.where(neg, 0.0, fw)
        up = xh_l * wl + xh * wm + xh_r * wr
        m = jnp.max(up, axis=-1, keepdims=True)  # (ch, w, 1)
        e = jnp.exp(up - m)
        lse = m + jnp.log(jnp.sum(e, axis=-1, keepdims=True))
        lbl = _lane_pick(lbl_all, ph * s + pw)  # (ch, w, 1)
        valid = (lbl >= 0) & (lbl < num_classes)
        safe = jnp.where(valid, lbl, 0)
        picked = jnp.sum(jnp.where(iota_c == safe, up, 0.0), axis=-1,
                         keepdims=True)
        tot = tot + jnp.where(valid, lse - picked, 0.0)
        if count_acc:
            cor = cor + jnp.where(valid & (picked == m), 1.0, 0.0)
        return tot, cor, xh, xh_l, xh_r, ph

    def h_body(ph, carry):
        tot, cor = carry
        dh, fh = _phase_coeff_dyn(ph, s)
        # δ ∈ {−1, 0} always → the dynamic row slice is a select between the
        # two static slices (Mosaic has no value-level dynamic_slice)
        neg_h = dh < 0
        lo = jnp.where(neg_h, ext[0:ch], ext[1 : 1 + ch])
        hi = jnp.where(neg_h, ext[1 : 1 + ch], ext[2 : 2 + ch])
        xh = lo * (1.0 - fh) + hi * fh  # (ch, w, Cp)
        xh_l = _sl_shift(xh, down=True)
        xh_r = _sl_shift(xh, down=False)
        tot, cor, *_ = jax.lax.fori_loop(
            0, s, w_body, (tot, cor, xh, xh_l, xh_r, ph))
        return tot, cor

    tot = jnp.zeros((ch, wlen, 1), jnp.float32)
    cor = jnp.zeros((ch, wlen, 1), jnp.float32)
    tot, cor = jax.lax.fori_loop(0, s, h_body, (tot, cor))
    wsum_ref[0] = tot * img_w
    corr_ref[0] = cor


@functools.partial(jax.jit, static_argnames=("s", "img_w", "count_acc", "ch",
                                             "interpret"))
def _ce_fwd_loss_pallas3(logits, labels_phw, s: int, img_w: float,
                         count_acc: bool = True, ch: int = 8,
                         interpret: bool = False):
    """labels_phw is the w-major phase layout (N, h, w, s²) — see
    ``labels_to_phase_w``. Returns (weighted-sum, correct-count) scalars."""
    n, h, w, c = logits.shape
    cp = -(-c // 128) * 128
    if cp != c:
        logits = jnp.pad(logits, ((0, 0),) * 3 + ((0, cp - c),),
                         constant_values=_NEG)
    while ch > 1 and h % ch:
        ch -= 1
    grid = (n, h // ch)
    g = h // ch
    view = lambda fix: pl.BlockSpec((1, ch, w, cp), fix, memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((1, ch, w, 1), lambda ni, i: (ni, i, 0, 0),
                            memory_space=pltpu.VMEM)
    wsum, corr = pl.pallas_call(
        functools.partial(_fwd_loss_kernel3, s=s, ch=ch, num_classes=c,
                          img_w=img_w, count_acc=count_acc),
        out_shape=(
            jax.ShapeDtypeStruct((n, h, w, 1), jnp.float32),
            jax.ShapeDtypeStruct((n, h, w, 1), jnp.float32),
        ),
        grid=grid,
        in_specs=[
            view(lambda ni, i: (ni, jnp.maximum(i - 1, 0), 0, 0)),
            view(lambda ni, i: (ni, i, 0, 0)),
            view(lambda ni, i, g=g: (ni, jnp.minimum(i + 1, g - 1), 0, 0)),
            pl.BlockSpec((1, ch, w, s * s), lambda ni, i: (ni, i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(out_spec, out_spec),
        interpret=interpret,
    )(logits, logits, logits, labels_phw)
    return jnp.sum(wsum), jnp.sum(corr)


def _bwd_loss_kernel3(xprev_ref, xcur_ref, xnext_ref,
                      lprev_ref, lcur_ref, lnext_ref, ct_ref,
                      dx_ref, *, s: int, ch: int, num_classes: int,
                      img_w: float):
    """Layout-aligned twin of ``_bwd_loss_kernel``: labels/cotangent masks are
    (he, w, 1) rank-3 (w in sublanes throughout), W-transpose shifts are
    sublane rolls."""
    i = pl.program_id(1)
    g = pl.num_programs(1)
    ct = ct_ref[0, 0] * img_w

    xcur = xcur_ref[0].astype(jnp.float32)  # (ch, w, Cp)
    first = i == 0
    last = i == g - 1
    xm2 = jnp.where(i > 0, xprev_ref[0, 0].astype(jnp.float32), xcur[0])
    xm1 = jnp.where(i > 0, xprev_ref[0, 1].astype(jnp.float32), xcur[0])
    xp1 = jnp.where(i < g - 1, xnext_ref[0, 0].astype(jnp.float32), xcur[ch - 1])
    xp2 = jnp.where(i < g - 1, xnext_ref[0, 1].astype(jnp.float32), xcur[ch - 1])
    xe = jnp.concatenate([xm2[None], xm1[None], xcur, xp1[None], xp2[None]], 0)

    cp = xe.shape[-1]
    wlen = xe.shape[1]
    he = ch + 2
    iota_c = jax.lax.broadcasted_iota(jnp.int32, (he, wlen, cp), 2)
    # (he, w, s²) label halo: 1-row slivers + current block, all rank-3 —
    # built once, phase-sliced by masked lane reduce inside the loop
    ltop = jnp.where(i > 0, lprev_ref[0, 0], lcur_ref[0, 0])
    lbot = jnp.where(i < g - 1, lnext_ref[0, 0], lcur_ref[0, ch - 1])
    lbl_halo = jnp.concatenate([ltop[None], lcur_ref[0], lbot[None]],
                               0).astype(jnp.int32)

    def w_body(pw, carry):
        dxh, xh, xh_l, xh_r, ph = carry
        dw, fw = _phase_coeff_dyn(pw, s)
        neg = dw < 0
        wl = jnp.where(neg, 1.0 - fw, 0.0)
        wm = jnp.where(neg, fw, 1.0 - fw)
        wr = jnp.where(neg, 0.0, fw)
        up = xh_l * wl + xh * wm + xh_r * wr

        lbl = _lane_pick(lbl_halo, ph * s + pw)  # (he, w, 1)
        valid = (lbl >= 0) & (lbl < num_classes)
        safe = jnp.where(valid, lbl, 0)
        gv = jnp.where(valid, ct, 0.0)  # (he, w, 1)
        row = jax.lax.broadcasted_iota(jnp.int32, gv.shape, 0)
        gv = jnp.where(first & (row == 0), 0.0, gv)
        gv = jnp.where(last & (row == he - 1), 0.0, gv)

        m = jnp.max(up, axis=-1, keepdims=True)
        e = jnp.exp(up - m)
        sm = e / jnp.sum(e, axis=-1, keepdims=True)
        onehot = (iota_c == safe).astype(jnp.float32)
        t = gv * (sm - onehot)  # (he, w, Cp)

        # transpose of the W comb, uniform over the two δ cases
        # (δ<0: (1−f)·t[v+1] + f·t[v], col-0 edge fold of weight 1−f;
        #  δ≥0: (1−f)·t[v] + f·t[v−1], col-(w−1) edge fold of weight f)
        # — same (wl, wm, wr) scalars as the forward comb, applied to the
        # transposed shift directions
        col = jax.lax.broadcasted_iota(jnp.int32, t.shape, 1)
        up_sh = _sl_shift_zero(t, down=False)   # t[v+1]
        dn_sh = _sl_shift_zero(t, down=True)    # t[v−1]
        dW = up_sh * wl + t * wm + dn_sh * wr
        dW = dW + jnp.where(col == 0, wl * t, 0.0)
        dW = dW + jnp.where(col == wlen - 1, wr * t, 0.0)
        return dxh + dW, xh, xh_l, xh_r, ph

    def h_body(ph, dx):
        dh, fh = _phase_coeff_dyn(ph, s)
        # δ ∈ {−1, 0} → selects between static row slices (see fwd kernel)
        neg_h = dh < 0
        lo = jnp.where(neg_h, xe[0:he], xe[1 : 1 + he])
        hi = jnp.where(neg_h, xe[1 : 1 + he], xe[2 : 2 + he])
        xh = lo * (1.0 - fh) + hi * fh
        xh_l = _sl_shift(xh, down=True)
        xh_r = _sl_shift(xh, down=False)
        dxh = jnp.zeros((he, wlen, cp), jnp.float32)
        dxh, *_ = jax.lax.fori_loop(0, s, w_body, (dxh, xh, xh_l, xh_r, ph))
        a = jnp.where(neg_h, dxh[2 : 2 + ch], dxh[1 : 1 + ch])
        b = jnp.where(neg_h, dxh[1 : 1 + ch], dxh[0:ch])
        contrib = a * (1.0 - fh) + b * fh
        rowc = jax.lax.broadcasted_iota(jnp.int32, contrib.shape, 0)
        contrib = contrib + jnp.where(
            neg_h & first & (rowc == 0), (1.0 - fh) * dxh[1][None], 0.0)
        contrib = contrib + jnp.where(
            (~neg_h) & last & (rowc == ch - 1), fh * dxh[ch][None], 0.0)
        return dx + contrib

    dx = jnp.zeros((ch, wlen, cp), jnp.float32)
    dx = jax.lax.fori_loop(0, s, h_body, dx)
    dx_ref[0] = dx.astype(dx_ref.dtype)


@functools.partial(jax.jit, static_argnames=("s", "c", "img_w", "ch",
                                             "interpret"))
def _ce_bwd_loss_pallas3(logits, labels_phw, ct, s: int, c: int, img_w: float,
                         ch: int = 8, interpret: bool = False):
    n, h, w, _ = logits.shape
    cp = -(-c // 128) * 128
    if cp != c:
        logits = jnp.pad(logits, ((0, 0),) * 3 + ((0, cp - c),),
                         constant_values=_NEG)
    while ch > 1 and (h % ch or ch % 2):
        ch -= 1
    assert ch >= 2, "backward kernel needs an even row-chunk divisor of h"
    grid = (n, h // ch)
    g = h // ch
    h2 = h // 2
    xcurv = pl.BlockSpec((1, ch, w, cp), lambda ni, i: (ni, i, 0, 0),
                         memory_space=pltpu.VMEM)
    xprevv = pl.BlockSpec(
        (1, 2, w, cp),
        lambda ni, i, ch=ch: (ni, jnp.maximum(i * (ch // 2) - 1, 0), 0, 0),
        memory_space=pltpu.VMEM)
    xnextv = pl.BlockSpec(
        (1, 2, w, cp),
        lambda ni, i, ch=ch, h2=h2: (ni, jnp.minimum((i + 1) * (ch // 2), h2 - 1), 0, 0),
        memory_space=pltpu.VMEM)
    pcurv = pl.BlockSpec((1, ch, w, s * s), lambda ni, i: (ni, i, 0, 0),
                         memory_space=pltpu.VMEM)
    pprevv = pl.BlockSpec(
        (1, 1, w, s * s),
        lambda ni, i, ch=ch: (ni, jnp.maximum(i * ch - 1, 0), 0, 0),
        memory_space=pltpu.VMEM)
    pnextv = pl.BlockSpec(
        (1, 1, w, s * s),
        lambda ni, i, ch=ch, h=h: (ni, jnp.minimum((i + 1) * ch, h - 1), 0, 0),
        memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_bwd_loss_kernel3, s=s, ch=ch, num_classes=c,
                          img_w=img_w),
        out_shape=jax.ShapeDtypeStruct((n, h, w, cp), jnp.float32),
        grid=grid,
        in_specs=[
            xprevv, xcurv, xnextv,
            pprevv, pcurv, pnextv,
            pl.BlockSpec((1, 1), lambda ni, i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, ch, w, cp), lambda ni, i: (ni, i, 0, 0),
                               memory_space=pltpu.VMEM),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=40 << 20),
        interpret=interpret,
    )(logits, logits, logits,
      labels_phw, labels_phw, labels_phw,
      ct.astype(jnp.float32).reshape(1, 1))
    return out[..., :c]


def ce_upsampled_loss_xla(logits, labels_ph, s: int, img_w: float,
                          count_acc: bool = True):
    """Identical-math XLA composition of ``ce_upsampled_loss`` (oracle /
    CPU fallback): masked-nll weighted sum + valid-correct count."""
    nll, pred = ce_upsampled_nll_xla(logits, labels_ph, s)
    c = logits.shape[-1]
    valid = (labels_ph >= 0) & (labels_ph < c)
    wsum = jnp.sum(jnp.where(valid, nll, 0.0)) * img_w
    corr = jnp.sum((valid & (pred == labels_ph)).astype(jnp.float32))
    if not count_acc:
        corr = jnp.zeros((), jnp.float32)
    return wsum, corr


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def ce_upsampled_loss(logits, labels_ph, s: int, img_w: float,
                      count_acc: bool = True):
    """Fully-reduced upsampled CE: ``(Σ_valid nll)·img_w`` and the count of
    valid correctly-predicted pixels, straight from low-res logits.

    ``img_w`` is a *static* per-segment weight (e.g. ``0.5 / num_pixels``
    for the per-frame branch of the clip loss) baked into the kernel.
    Differentiable wrt ``logits`` only; the correct-count output carries no
    gradient (it is a logging metric, zero a.e. anyway).

    Served by the measured round-5 winners (tools/bench_ce.py sweep at the
    B=8 train geometry): forward = the v2 kernel with the masked-max label
    pick (10.6 ms); backward = the v5 rank-3/w-major-labels kernel
    (12.8 ms vs v2's 14.2). The v3 fori-loop variants measured slower on
    both sides and remain only as bench baselines.
    """
    return _ce_fwd_loss_pallas(logits, labels_ph, s, img_w, count_acc,
                               interpret=_INTERPRET)


def _ce_loss_fwd(logits, labels_ph, s: int, img_w: float, count_acc: bool):
    out = _ce_fwd_loss_pallas(logits, labels_ph, s, img_w, count_acc,
                              interpret=_INTERPRET)
    return out, (logits, labels_ph)


def _ce_loss_bwd(s: int, img_w: float, count_acc: bool, res, cts):
    logits, labels_ph = res
    g_wsum, _ = cts  # correct-count output: no gradient path
    # the v5 backward takes w-major labels; the u8 swap runs at 1/4 width
    dlogits = _ce_bwd_loss_pallas5(logits, jnp.swapaxes(labels_ph, 2, 3),
                                   g_wsum, s, logits.shape[-1], img_w,
                                   interpret=_INTERPRET)
    return (dlogits.astype(logits.dtype),
            np.zeros(labels_ph.shape, dtype=jax.dtypes.float0))


ce_upsampled_loss.defvjp(_ce_loss_fwd, _ce_loss_bwd)


# ---------------------------------------------------------------------------
# XLA reference (identical math; CPU fallback + test oracle)
# ---------------------------------------------------------------------------


def ce_upsampled_nll_xla(logits, labels_ph, s: int):
    """Upsample-then-CE via ``resize_bilinear`` (the pre-kernel formulation)."""
    n, h, w, c = logits.shape
    up = resize_bilinear(logits.astype(jnp.float32), (h * s, w * s))
    lse = jax.scipy.special.logsumexp(up, axis=-1)
    lbl = phase_to_natural(labels_ph, s).astype(jnp.int32)
    # out-of-range (ignored) labels pick class 0, matching the kernel and
    # ``losses.cross_entropy`` — those pixels are masked by every consumer
    safe = jnp.where((lbl >= 0) & (lbl < c), lbl, 0)
    picked = jnp.sum(
        jnp.where(safe[..., None] == jnp.arange(c), up, 0.0), axis=-1
    )
    pred = jnp.argmax(up, axis=-1).astype(jnp.int32)
    return labels_to_phase(lse - picked, s), labels_to_phase(pred, s)


# ---------------------------------------------------------------------------
# public differentiable entry point
# ---------------------------------------------------------------------------

_INTERPRET = False  # tests flip this to run the kernels off-TPU


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def ce_upsampled_nll(logits, labels_ph, s: int):
    nll, pred, _ = _ce_fwd_pallas(logits, labels_ph, s, interpret=_INTERPRET)
    return nll, pred


def _ce_fwd(logits, labels_ph, s: int):
    nll, pred, lse = _ce_fwd_pallas(logits, labels_ph, s, interpret=_INTERPRET)
    return (nll, pred), (logits, labels_ph, lse)


def _ce_bwd(s: int, res, cts):
    logits, labels_ph, lse = res
    g_nll, _ = cts  # pred is int-valued: its cotangent is symbolic-zero
    dlogits = _ce_bwd_pallas(logits, labels_ph, lse, g_nll, s, logits.shape[-1],
                             interpret=_INTERPRET)
    return (dlogits.astype(logits.dtype),
            np.zeros(labels_ph.shape, dtype=jax.dtypes.float0))


ce_upsampled_nll.defvjp(_ce_fwd, _ce_bwd)
