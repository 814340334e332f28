"""MiT (Mix Vision Transformer / SegFormer encoder) — TPU-native flax version.

Functional re-design of the reference backbone
(``mmseg/models/backbones/mix_transformer.py:203-424``):

- 4 hierarchical stages; each = OverlapPatchEmbed (strided conv, reference
  ``:160-200``) → ``depth`` transformer blocks → LayerNorm.
- Efficient self-attention with spatial reduction (SRA): K/V are computed on
  a ``sr_ratio``-strided conv downsample of the token map (reference
  ``:96-117``).
- Mix-FFN: Dense → 3×3 depthwise conv (positional mixing) → GELU → Dense
  (reference ``:20-55, :358-369``).
- Stochastic depth with a linear decay schedule over all blocks
  (reference ``:223``).

TPU adaptations: NHWC layout end-to-end (feature maps stay (B, H, W, C);
attention reshapes to (B, N, C) views only, which XLA treats as free),
bf16-friendly compute dtype with f32 parameters, exact (erf) GELU matching
``torch.nn.GELU``.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops.dwconv import dwconv3x3

__all__ = ["MiTConfig", "MiT", "MIT_VARIANTS"]

# Parameter init matching the reference: truncated-normal(0.02) for dense
# kernels, zeros for biases (reference ``mix_transformer.py:33-46``).
_dense_init = nn.initializers.truncated_normal(stddev=0.02, lower=-2.0, upper=2.0)


def _conv_fanout_init(key, shape, dtype=jnp.float32):
    """He-normal over fan_out (kh*kw*out/groups), reference ``:41-46``.

    flax conv kernel shape: (kh, kw, in_per_group, out).
    """
    kh, kw, _, out = shape
    fan_out = kh * kw * out
    std = (2.0 / fan_out) ** 0.5
    return jax.random.normal(key, shape, dtype) * std


def _dwconv_fanout_init(key, shape, dtype=jnp.float32):
    """Depthwise conv: groups == out channels, so fan_out = kh*kw."""
    kh, kw, _, out = shape
    fan_out = kh * kw
    std = (2.0 / fan_out) ** 0.5
    return jax.random.normal(key, shape, dtype) * std


def drop_path(x: jnp.ndarray, rate: float, deterministic: bool, rng) -> jnp.ndarray:
    """Per-sample stochastic depth (timm ``DropPath`` semantics)."""
    if deterministic or rate == 0.0:
        return x
    keep = 1.0 - rate
    shape = (x.shape[0],) + (1,) * (x.ndim - 1)
    mask = jax.random.bernoulli(rng, keep, shape)
    return jnp.where(mask, x / keep, jnp.zeros_like(x))


@dataclasses.dataclass(frozen=True)
class MiTConfig:
    embed_dims: tuple[int, ...] = (64, 128, 320, 512)
    depths: tuple[int, ...] = (2, 2, 2, 2)
    num_heads: tuple[int, ...] = (1, 2, 5, 8)
    sr_ratios: tuple[int, ...] = (8, 4, 2, 1)
    mlp_ratios: tuple[int, ...] = (4, 4, 4, 4)
    qkv_bias: bool = True
    drop_rate: float = 0.0
    attn_drop_rate: float = 0.0
    drop_path_rate: float = 0.1
    patch_sizes: tuple[int, ...] = (7, 3, 3, 3)
    patch_strides: tuple[int, ...] = (4, 2, 2, 2)
    norm_eps: float = 1e-6  # block/stage norms (reference ``:378`` partial eps)
    # dwconv implementation: None = auto (Pallas on TPU, XLA elsewhere)
    dwconv_impl: str | None = None
    # patch-embed implementation: None = strided nn.Conv; "im2col" = strided
    # slices + dense (identical params/math; makes the backbone conv-free so
    # XLA keeps default layouts around Pallas calls — see MixFFN). A 4-tuple
    # selects per stage (e.g. ("im2col", None, None, None) keeps only the
    # stage-1 embed conv-free — the producer of the fused-block pallas_call).
    embed_impl: str | tuple | None = None
    # whole-block fusion: "fused" = blocks run LN1+SRA-attn+proj+residual+
    # LN2+MixFFN+residual as ONE Pallas kernel at inference
    # (ops/stage_block.py); K/V stay XLA-side. "fused-interpret" for CPU
    # tests. A 4-tuple selects per stage — measured: the kernel wins at
    # C ≥ 128 lanes (stages 2+) and loses at stage 1's C=64 half-lane
    # geometry, so (None, "fused", "fused", "fused") is the fast set.
    block_impl: str | tuple | None = None
    # TRAINING-path block fusion: "ffn" serves x + s·FFN(LN2(x)) per block
    # from the differentiable Pallas pair (ops/mixffn.block_ffn_train:
    # megakernel forward + recompute-from-x backward emitting dx and all
    # parameter grads); the attention half stays composed. "ffn-interpret"
    # for CPU tests. A 4-tuple selects per stage. None = all-XLA training
    # (the shifts-cvjp dwconv path).
    train_block_impl: str | tuple | None = None


# Reference variant table (``mix_transformer.py:373-424``).
MIT_VARIANTS: dict[str, MiTConfig] = {
    "mit_b0": MiTConfig(embed_dims=(32, 64, 160, 256), depths=(2, 2, 2, 2)),
    "mit_b1": MiTConfig(embed_dims=(64, 128, 320, 512), depths=(2, 2, 2, 2)),
    "mit_b2": MiTConfig(depths=(3, 4, 6, 3)),
    "mit_b3": MiTConfig(depths=(3, 4, 18, 3)),
    "mit_b4": MiTConfig(depths=(3, 8, 27, 3)),
    "mit_b5": MiTConfig(depths=(3, 6, 40, 3)),
}


class _NonOverlapConv(nn.Module):
    """Conv with stride == kernel, computed as space-to-depth + einsum.

    Mathematically identical to ``nn.Conv`` with the same (k, k, Cin, Cout)
    kernel parameter (checkpoint-compatible), but XLA is free to fuse the
    patch reshape into the matmul instead of the conv emitter's layout
    round-trips (the SRA ``sr`` conv cost 0.155 ms/fwd in copies alone).
    """

    features: int
    patch: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        b, h, w, c = x.shape
        p = self.patch
        kernel = self.param("kernel", _conv_fanout_init, (p, p, c, self.features))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        if h % p or w % p:  # VALID-conv floor semantics for indivisible sizes
            x = x[:, : h // p * p, : w // p * p]
            h, w = x.shape[1:3]
        # Row-phase accumulation (same rework as _Im2ColConv): per kernel row
        # ri, ``x[:, ri::p]`` is a coalesced strided row slice whose
        # (W, C) → (W/p, p·C) reshape is a free row-major view; the conv is
        # then p matmuls of (p·C, F) accumulated in f32. The previous 6-D
        # s2d einsum made XLA materialize a (p, p, C)-minor transpose
        # (~70-100 µs per SRA K/V at stage-1 480²).
        kr = kernel.astype(self.dtype).reshape(p, p * c, self.features)
        acc = None
        for ri in range(p):
            ph = x[:, ri::p].reshape(b, h // p, w // p, p * c).astype(self.dtype)
            y = jnp.einsum("bhwk,kf->bhwf", ph, kr[ri],
                           preferred_element_type=jnp.float32)
            acc = y if acc is None else acc + y
        return (acc + bias.astype(jnp.float32)).astype(self.dtype)


class _Im2ColConv(nn.Module):
    """Strided overlap conv as strided slices + one dense matmul.

    Parameter tree identical to ``nn.Conv`` (kernel (k, k, Cin, Cout) +
    bias) so checkpoints are interchangeable with the conv formulation.
    Patch channels are ordered (di, dj, c) row-major, matching
    ``kernel.reshape(k*k*Cin, Cout)``. Emits zero convolution HLOs: with
    every patch embed in this form the backbone graph is conv-free, XLA's
    layout assignment keeps default (row-major) layouts throughout, and a
    Pallas custom call inside the backbone no longer drags relayout copies
    through the producer chain (the round-3 "layout contagion" that made
    the fused MixFFN kernel a net loss).
    """

    features: int
    kernel_size: int
    stride: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        b, h, w, c = x.shape
        k, s = self.kernel_size, self.stride
        assert k <= 2 * s, "block-pair extraction needs k <= 2*stride"
        kernel = self.param("kernel", _conv_fanout_init, (k, k, c, self.features))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        pad = k // 2
        ho = (h + 2 * pad - k) // s + 1
        wo = (w + 2 * pad - k) // s + 1
        # Row-phase space-to-depth, no patch concat (round-4 rework): the
        # previous block-pair 6-D transpose + 4-way lane concat cost 1.10 ms
        # at stage-1 480² (an XLA transpose on a 3-channel minor dim at 21×
        # the bandwidth roofline); this formulation measured 187 µs. Per row
        # phase ri, ``xp[:, ri::s]`` is a *coalesced* strided row slice and
        # the (W', C) → (W'/s, s·C) reshape is a free row-major view. The
        # k×k window of output (i, j) lives inside row cells (i, i+1) ×
        # col cells (j, j+1) because k ≤ 2s, so the conv is 4s partial
        # matmuls of (s·C, F) tap slabs accumulated in f32 — no transpose,
        # no concat, no conv HLO (keeps the backbone layout-neutral for the
        # Pallas megakernels).
        hp, wp = (ho + 2) * s, (wo + 2) * s
        xp = jnp.pad(x, ((0, 0), (s, hp - h - s), (s, wp - w - s), (0, 0)))
        # kernel zero-embedded at offset s-pad into the (2s, 2s) tap grid
        k8 = jnp.zeros((2 * s, 2 * s, c, self.features), kernel.dtype)
        k8 = jax.lax.dynamic_update_slice(k8, kernel, (s - pad, s - pad, 0, 0))
        k8 = k8.astype(self.dtype)
        acc = None
        for rc in (0, 1):
            for ri in range(s):
                ph = xp[:, ri::s].reshape(b, hp // s, wp // s, s * c)
                rows = ph[:, rc : rc + ho]
                for cc in (0, 1):
                    blk = rows[:, :, cc : cc + wo].astype(self.dtype)
                    wk = k8[rc * s + ri, cc * s : (cc + 1) * s].reshape(
                        s * c, self.features)
                    y = jnp.einsum("bhwk,kf->bhwf", blk, wk,
                                   preferred_element_type=jnp.float32)
                    acc = y if acc is None else acc + y
        return (acc + bias.astype(jnp.float32)).astype(self.dtype)


class OverlapPatchEmbed(nn.Module):
    """Strided conv patch embed + LayerNorm (reference ``:160-200``)."""

    embed_dim: int
    patch_size: int
    stride: int
    impl: str | None = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:  # (B, H, W, C) -> (B, H', W', D)
        pad = self.patch_size // 2
        if self.impl == "im2col":
            x = _Im2ColConv(self.embed_dim, self.patch_size, self.stride,
                            self.dtype, name="proj")(x)
        else:
            x = nn.Conv(
                self.embed_dim,
                (self.patch_size, self.patch_size),
                strides=(self.stride, self.stride),
                padding=[(pad, pad), (pad, pad)],
                kernel_init=_conv_fanout_init,
                dtype=self.dtype,
                name="proj",
            )(x)
        # Patch-embed norm keeps torch's default eps=1e-5 (not the 1e-6
        # partial — reference ``:175`` uses bare nn.LayerNorm).
        x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm")(x)
        return x


class SRAttention(nn.Module):
    """Spatial-reduction attention (reference ``Attention``, ``:58-117``)."""

    dim: int
    num_heads: int
    sr_ratio: int
    qkv_bias: bool = True
    attn_drop: float = 0.0
    proj_drop: float = 0.0
    norm_eps: float = 1e-6
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True,
                 kv_only: bool = False):
        b, h, w, c = x.shape
        head_dim = self.dim // self.num_heads
        scale = head_dim**-0.5

        if kv_only:
            # Fused-block path: compute only the spatial-reduced
            # K/V here (cheap, S ≈ HW/sr² tokens) and hand the q/proj params to
            # the megakernel. _DenseParams shares nn.Dense's exact param tree,
            # so checkpoints are interchangeable with the composed path.
            kv_in = x
            if self.sr_ratio > 1:
                kv_in = _NonOverlapConv(self.dim, self.sr_ratio, self.dtype, name="sr")(x)
                kv_in = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm")(kv_in)
            n_kv = kv_in.shape[1] * kv_in.shape[2]
            kv = nn.Dense(2 * self.dim, use_bias=self.qkv_bias,
                          kernel_init=_dense_init, dtype=self.dtype, name="kv")(kv_in)
            kv = kv.reshape(b, n_kv, 2, self.dim)
            k, v = kv[:, :, 0], kv[:, :, 1]
            wq, bq = _DenseParams(c, self.dim, use_bias=self.qkv_bias, name="q")()
            wp, bp = _DenseParams(self.dim, self.dim, name="proj")()
            return k, v, wq, bq, wp, bp

        q = nn.Dense(self.dim, use_bias=self.qkv_bias, kernel_init=_dense_init, dtype=self.dtype, name="q")(x)
        q = q.reshape(b, h * w, self.num_heads, head_dim)

        if self.sr_ratio > 1:
            # stride==kernel VALID conv ≡ space-to-depth dense (same params)
            kv_in = _NonOverlapConv(self.dim, self.sr_ratio, self.dtype, name="sr")(x)
            # Post-SR norm keeps torch default eps=1e-5 (reference ``:77``).
            kv_in = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm")(kv_in)
        else:
            kv_in = x
        n_kv = kv_in.shape[1] * kv_in.shape[2]
        kv = nn.Dense(2 * self.dim, use_bias=self.qkv_bias, kernel_init=_dense_init, dtype=self.dtype, name="kv")(kv_in)
        kv = kv.reshape(b, n_kv, 2, self.num_heads, head_dim)
        k, v = kv[:, :, 0], kv[:, :, 1]

        attn = jnp.einsum("bqhd,bkhd->bhqk", q * scale, k)
        attn = jax.nn.softmax(attn.astype(jnp.float32), axis=-1).astype(self.dtype)
        if self.attn_drop > 0.0:
            attn = nn.Dropout(self.attn_drop)(attn, deterministic=deterministic)
        # Head merge fused into the output projection (num_heads > 1 only):
        # contracting (head, head_dim) jointly against the proj kernel
        # reshaped (nh, hd, C) skips the materialized (B, q, nh, hd)
        # transpose XLA otherwise emits per block forward AND backward
        # (B=8 train profile: ~2 ms/step across stages 2-3). With a single
        # head the merge is already a free reshape and the 3-operand einsum
        # lowers worse — keep the plain Dense there. Same params either way
        # (dense kernel rows are (h·d)-flattened head-major).
        kp, bp = _DenseParams(self.dim, self.dim, name="proj")()
        if self.num_heads > 1:
            ctx = jnp.einsum("bhqk,bkhd->bhqd", attn, v)
            out = jnp.einsum(
                "bhqd,hdc->bqc",
                ctx,
                kp.astype(self.dtype).reshape(self.num_heads, head_dim, self.dim),
            ) + bp.astype(self.dtype)
            out = out.reshape(b, h, w, self.dim)
        else:
            out = jnp.einsum("bhqk,bkhd->bqhd", attn, v).reshape(b, h, w, self.dim)
            out = out @ kp.astype(self.dtype) + bp.astype(self.dtype)
        if self.proj_drop > 0.0:
            out = nn.Dropout(self.proj_drop)(out, deterministic=deterministic)
        return out


class _DenseParams(nn.Module):
    """Parameter holder with ``nn.Dense``'s exact tree (kernel/bias) — lets
    the owner fuse across sibling layers while checkpoints stay
    interchangeable with the module composition."""

    in_features: int
    features: int
    use_bias: bool = True

    @nn.compact
    def __call__(self):
        k = self.param("kernel", _dense_init, (self.in_features, self.features))
        if not self.use_bias:  # tree matches nn.Dense(use_bias=False)
            return k, jnp.zeros((self.features,), k.dtype)
        b = self.param("bias", nn.initializers.zeros, (self.features,))
        return k, b


class _LNParams(nn.Module):
    """Parameter holder matching ``nn.LayerNorm``'s tree (scale/bias) — lets
    MiTBlock feed the norm into the fused block-FFN kernel while checkpoints
    stay interchangeable with the module composition."""

    dim: int

    @nn.compact
    def __call__(self):
        s = self.param("scale", nn.initializers.ones, (self.dim,))
        b = self.param("bias", nn.initializers.zeros, (self.dim,))
        return s, b


class _DWConvParams(nn.Module):
    """Parameter holder matching ``DWConv3x3``'s tree (kernel (3,3,1,C) + bias)."""

    dim: int

    @nn.compact
    def __call__(self):
        k = self.param("kernel", _dwconv_fanout_init, (3, 3, 1, self.dim))
        b = self.param("bias", nn.initializers.zeros, (self.dim,))
        return k, b


class MixFFN(nn.Module):
    """Dense → 3×3 depthwise conv → GELU → Dense (reference ``Mlp``/``DWConv``).

    On TPU at inference the whole FFN runs as ONE Pallas kernel
    (``ops.mixffn``): the (B, H, W, 4C) hidden tensor lives only in VMEM —
    under the unfused formulation it made 3 HBM round-trips (fc1 write,
    9 shifted tap reads, fc2 read), the top line item of the round-2
    forward profile. Training and non-TPU keep the module composition
    (the fused kernel carries no VJP).
    """

    dim: int
    hidden_dim: int
    drop: float = 0.0
    dwconv_impl: str | None = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True,
                 residual_ln: tuple | None = None, params_only: bool = False):
        k1, b1 = _DenseParams(x.shape[-1], self.hidden_dim, name="fc1")()
        kdw, bdw = _DWConvParams(self.hidden_dim, name="dwconv")()
        k2, b2 = _DenseParams(self.hidden_dim, self.dim, name="fc2")()
        if params_only:  # fused-block path: the megakernel consumes these
            return k1, b1, kdw, bdw, k2, b2

        if residual_ln is not None:
            # x is the PRE-norm residual stream; compute x + FFN(LN(x)) as one
            # Pallas kernel (LN + fc1 + dwconv + GELU + fc2 + residual with
            # the hidden map VMEM-resident). Only reachable from MiTBlock's
            # fused inference path.
            from ..ops.mixffn import block_ffn_fused

            gamma, beta, eps = residual_ln
            return block_ffn_fused(
                x.astype(self.dtype), gamma, beta, k1, b1, kdw, bdw, k2, b2,
                eps=eps, interpret=self.dwconv_impl == "fused-interpret")

        impl = self.dwconv_impl
        # The fused kernel is opt-in, NOT the auto default: in isolation it
        # is ~2× the shifts composition (hidden never leaves VMEM), but any
        # backbone pallas_call forces default operand layouts and XLA's
        # global layout assignment re-layouts the surrounding activation
        # chain — measured at CFFM-B1 480²: shifts-everywhere 4.46 ms vs
        # 6.9 ms with stages 2–4 fused / 7.0 ms with only the lane-aligned
        # C∈{128,512} stages fused (patch_embed1 conv 0.20→0.97 ms, stage-1
        # LayerNorms ~4×, +0.9 ms copies) — the poison is the custom-call
        # boundary itself, not lane padding. Revisit only as a stage-level
        # megakernel (LN+attn+FFN in one pallas region).
        use_fused = (impl == "fused" and deterministic and self.drop == 0.0
                     and jax.devices()[0].platform in ("tpu", "axon"))
        if use_fused or impl == "fused-interpret":
            from ..ops.mixffn import mixffn_fused

            return mixffn_fused(x.astype(self.dtype), k1, b1, kdw, bdw, k2, b2,
                                interpret=impl == "fused-interpret")

        dt = self.dtype
        x = x.astype(dt) @ k1.astype(dt) + b1.astype(dt)  # ≡ nn.Dense
        # dwconv + exact-erf GELU (torch nn.GELU), fused into one kernel pass
        x = dwconv3x3(x, kdw, bdw, gelu=True, force=None if impl == "fused" else impl,
                      train=not deterministic)
        if self.drop > 0.0:
            x = nn.Dropout(self.drop)(x, deterministic=deterministic)
        x = x.astype(dt) @ k2.astype(dt) + b2.astype(dt)
        if self.drop > 0.0:
            x = nn.Dropout(self.drop)(x, deterministic=deterministic)
        return x


class MiTBlock(nn.Module):
    """Pre-norm transformer block (reference ``Block``, ``:120-157``)."""

    dim: int
    num_heads: int
    sr_ratio: int
    mlp_ratio: int
    qkv_bias: bool
    drop: float
    attn_drop: float
    drop_path_rate: float
    norm_eps: float
    dwconv_impl: str | None = None
    block_impl: str | None = None
    train_block_impl: str | None = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        # S tokens the kernel's (th+2, wp, Sp) score buffer must hold: the
        # floor-divided SR grid (sr > 1, matching _NonOverlapConv) or the
        # full token map (sr == 1 — stage 4's 1/32 grid, still tiny).
        _, _h, _w, _ = x.shape
        n_kv = (_h // self.sr_ratio) * (_w // self.sr_ratio) \
            if self.sr_ratio > 1 else _h * _w
        use_mega = (
            self.block_impl in ("fused", "fused-interpret")
            and self.dim % self.num_heads == 0 and n_kv <= 2048
            and deterministic and self.drop == 0.0 and self.attn_drop == 0.0
            and (self.block_impl == "fused-interpret"
                 or jax.devices()[0].platform in ("tpu", "axon"))
        )
        use_train_full = (
            self.train_block_impl in ("full", "full-interpret")
            and not deterministic and self.drop == 0.0
            and self.attn_drop == 0.0
            and self.dim % self.num_heads == 0 and n_kv <= 2048
            and (self.train_block_impl == "full-interpret"
                 or jax.devices()[0].platform in ("tpu", "axon"))
        )
        if use_train_full:
            from ..ops.stage_block import (mit_block_train,
                                           mit_block_train_fits)

            hidden = int(self.dim * self.mlp_ratio)
            if mit_block_train_fits(_h, _w, self.dim, hidden, self.num_heads,
                                    n_kv, jnp.dtype(self.dtype).itemsize):
                # Whole block (both halves) as ONE differentiable Pallas
                # pair; K/V stay XLA-side so their producer chain (sr conv +
                # LN + kv dense) backprops through XLA, and the kernel
                # returns dK/dV. Branch scales reproduce the two drop_path
                # draws of the composed path.
                g1, be1 = _LNParams(self.dim, name="norm1")()
                xf0 = x.astype(jnp.float32)
                mu = jnp.mean(xf0, axis=-1, keepdims=True)
                var = jnp.mean(jnp.square(xf0 - mu), axis=-1, keepdims=True)
                h1 = ((xf0 - mu) * jax.lax.rsqrt(var + self.norm_eps)
                      * g1.astype(jnp.float32) + be1.astype(jnp.float32)
                      ).astype(self.dtype)
                k, v, wq, bq, wpr, bpr = SRAttention(
                    self.dim, self.num_heads, self.sr_ratio, self.qkv_bias,
                    self.attn_drop, self.drop, self.norm_eps, self.dtype,
                    name="attn",
                )(h1, deterministic, kv_only=True)
                g2, be2 = _LNParams(self.dim, name="norm2")()
                k1, b1, kdw, bdw, k2, b2 = MixFFN(
                    self.dim, hidden, self.drop, self.dwconv_impl,
                    self.dtype, name="mlp",
                )(x, deterministic, params_only=True)
                nb = x.shape[0]
                if self.drop_path_rate > 0.0:
                    keep = 1.0 - self.drop_path_rate
                    rng_dp = self.make_rng("droppath")
                    ra, rf = jax.random.split(rng_dp)
                    s_a = jax.random.bernoulli(ra, keep, (nb,)).astype(
                        jnp.float32) / keep
                    s_f = jax.random.bernoulli(rf, keep, (nb,)).astype(
                        jnp.float32) / keep
                else:
                    s_a = jnp.ones((nb,), jnp.float32)
                    s_f = jnp.ones((nb,), jnp.float32)
                return mit_block_train(
                    x.astype(self.dtype), g1, be1, wq, bq, k, v, wpr, bpr,
                    g2, be2, k1, b1, kdw, bdw, k2, b2, s_a, s_f,
                    self.num_heads, self.norm_eps,
                    self.train_block_impl == "full-interpret")
        if use_mega:
            # Whole block as ONE Pallas kernel (ops/stage_block.py): LN1 +
            # q-proj + SRA attention + out-proj + residual + LN2 + MixFFN +
            # residual, all VMEM-resident. K/V (S ≈ HW/sr² tokens) stay
            # XLA-side. All param holders keep the composed path's exact
            # trees, so checkpoints are interchangeable.
            from ..ops.stage_block import mit_block_fused

            g1, be1 = _LNParams(self.dim, name="norm1")()
            # K/V consume LN1(x) like the composed path (reference Block
            # applies norm1 before Attention, incl. its SR branch). This LN1
            # pass is XLA-side — the kernel recomputes LN1 in-register for q,
            # so only the sr-conv branch reads this map (XLA fuses the LN
            # into the pooling input; ~2 MB extra traffic per block).
            xf = x.astype(jnp.float32)
            mu = jnp.mean(xf, axis=-1, keepdims=True)
            var = jnp.mean(jnp.square(xf - mu), axis=-1, keepdims=True)
            h1 = ((xf - mu) * jax.lax.rsqrt(var + self.norm_eps)
                  * g1.astype(jnp.float32) + be1.astype(jnp.float32)
                  ).astype(self.dtype)
            k, v, wq, bq, wpr, bpr = SRAttention(
                self.dim, self.num_heads, self.sr_ratio, self.qkv_bias,
                self.attn_drop, self.drop, self.norm_eps, self.dtype,
                name="attn",
            )(h1, deterministic, kv_only=True)
            g2, be2 = _LNParams(self.dim, name="norm2")()
            k1, b1, kdw, bdw, k2, b2 = MixFFN(
                self.dim, int(self.dim * self.mlp_ratio), self.drop,
                self.dwconv_impl, self.dtype, name="mlp",
            )(x, deterministic, params_only=True)
            return mit_block_fused(
                x.astype(self.dtype), g1, be1, wq, bq, k, v, wpr, bpr,
                g2, be2, k1, b1, kdw, bdw, k2, b2,
                num_heads=self.num_heads, eps=self.norm_eps,
                interpret=self.block_impl == "fused-interpret")

        h = nn.LayerNorm(epsilon=self.norm_eps, dtype=self.dtype, name="norm1")(x)
        h = SRAttention(
            self.dim,
            self.num_heads,
            self.sr_ratio,
            self.qkv_bias,
            self.attn_drop,
            self.drop,
            self.norm_eps,
            self.dtype,
            name="attn",
        )(h, deterministic)
        if not deterministic and self.drop_path_rate > 0.0:
            h = drop_path(h, self.drop_path_rate, deterministic, self.make_rng("droppath"))
        x = x + h
        mlp = MixFFN(self.dim, int(self.dim * self.mlp_ratio), self.drop,
                     self.dwconv_impl, self.dtype, name="mlp")
        hidden = int(self.dim * self.mlp_ratio)
        use_train_ffn = (
            self.train_block_impl in ("ffn", "ffn-interpret")
            and not deterministic and self.drop == 0.0
            and (self.train_block_impl == "ffn-interpret"
                 or jax.devices()[0].platform in ("tpu", "axon"))
        )
        if use_train_ffn:
            from ..ops.mixffn import block_ffn_train, block_ffn_train_fits

            if block_ffn_train_fits(x.shape[1], x.shape[2], self.dim, hidden,
                                    jnp.dtype(self.dtype).itemsize):
                # x + s·FFN(LN2(x)) as one differentiable Pallas pair; the
                # per-sample branch scale s reproduces drop_path exactly
                # (Bernoulli(keep)/keep), consumed from the same rng stream.
                scale2 = _LNParams(self.dim, name="norm2")()
                k1, b1, kdw, bdw, k2, b2 = mlp(x, deterministic,
                                               params_only=True)
                if self.drop_path_rate > 0.0:
                    keep = 1.0 - self.drop_path_rate
                    mask = jax.random.bernoulli(
                        self.make_rng("droppath"), keep, (x.shape[0],))
                    bscale = mask.astype(jnp.float32) / keep
                else:
                    bscale = jnp.ones((x.shape[0],), jnp.float32)
                return block_ffn_train(
                    x.astype(self.dtype), scale2[0], scale2[1], k1, b1, kdw,
                    bdw, k2, b2, bscale, self.norm_eps,
                    self.train_block_impl == "ffn-interpret")
        use_fused = (
            self.dwconv_impl in ("fused", "fused-interpret")
            and deterministic and self.drop == 0.0
            and (self.dwconv_impl == "fused-interpret"
                 or jax.devices()[0].platform in ("tpu", "axon"))
        )
        if use_fused:
            # LN2 + FFN + residual as ONE Pallas kernel; the norm2 param
            # holder keeps nn.LayerNorm's exact tree (scale/bias) so
            # checkpoints are interchangeable with the unfused path
            scale2 = _LNParams(self.dim, name="norm2")()
            return mlp(x, deterministic,
                       residual_ln=(scale2[0], scale2[1], self.norm_eps))
        h = nn.LayerNorm(epsilon=self.norm_eps, dtype=self.dtype, name="norm2")(x)
        h = mlp(h, deterministic)
        if not deterministic and self.drop_path_rate > 0.0:
            h = drop_path(h, self.drop_path_rate, deterministic, self.make_rng("droppath"))
        return x + h


class MiT(nn.Module):
    """4-stage hierarchical encoder returning features at 1/4, 1/8, 1/16, 1/32."""

    config: MiTConfig
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True) -> list[jnp.ndarray]:
        cfg = self.config
        total_depth = sum(cfg.depths)
        # Linear stochastic-depth decay across all blocks (reference ``:223``).
        dpr = [cfg.drop_path_rate * i / max(total_depth - 1, 1) for i in range(total_depth)]
        outs = []
        cur = 0
        for s in range(4):
            embed_impl = (cfg.embed_impl[s] if isinstance(cfg.embed_impl, tuple)
                          else cfg.embed_impl)
            block_impl = (cfg.block_impl[s] if isinstance(cfg.block_impl, tuple)
                          else cfg.block_impl)
            train_block_impl = (
                cfg.train_block_impl[s]
                if isinstance(cfg.train_block_impl, tuple)
                else cfg.train_block_impl)
            if embed_impl == "im2col-always":
                # training-path experiment knob: keep the im2col embed in
                # BOTH modes (e.g. to starve XLA's layout assignment of conv
                # producers around the train-path Pallas kernels)
                embed_impl = "im2col"
            elif embed_impl == "im2col" and not deterministic:
                # im2col exists to keep the *inference* backbone conv-free so
                # Pallas megakernel custom calls can't poison the layout of
                # their producer chain. Training takes the composed
                # (differentiable) block path — no custom calls, no contagion
                # — and there the conv emitter is strictly faster: the
                # im2col fwd+bwd partial-matmul fusions measured ~4.7 ms of
                # the B=8 480² train step (f32[32,120,120,64] ×12 @ 390 µs).
                # Same param tree either way, so the flip is trace-time only.
                embed_impl = None
            x = OverlapPatchEmbed(
                cfg.embed_dims[s],
                cfg.patch_sizes[s],
                cfg.patch_strides[s],
                embed_impl,
                self.dtype,
                name=f"patch_embed{s + 1}",
            )(x)
            for i in range(cfg.depths[s]):
                x = MiTBlock(
                    dim=cfg.embed_dims[s],
                    num_heads=cfg.num_heads[s],
                    sr_ratio=cfg.sr_ratios[s],
                    mlp_ratio=cfg.mlp_ratios[s],
                    qkv_bias=cfg.qkv_bias,
                    drop=cfg.drop_rate,
                    attn_drop=cfg.attn_drop_rate,
                    drop_path_rate=dpr[cur + i],
                    norm_eps=cfg.norm_eps,
                    dwconv_impl=cfg.dwconv_impl,
                    block_impl=block_impl,
                    train_block_impl=train_block_impl,
                    dtype=self.dtype,
                    name=f"block{s + 1}_{i}",
                )(x, deterministic)
            x = nn.LayerNorm(epsilon=cfg.norm_eps, dtype=self.dtype, name=f"norm{s + 1}")(x)
            outs.append(x)
            cur += cfg.depths[s]
        return outs
