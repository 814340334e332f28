"""Global-temporal-context cluster cross-attention (CFFM++ GTC head).

Re-design of the reference ``BasicLayer_cluster`` chain
(``mmseg/models/decode_heads/pvt/swin_transformer_2d.py:157-262, 563-665,
1039-1148``) with ``only_use_cluster_center_as_context=True`` — the only mode
any live config reaches.

Observation that simplifies the TPU version: with shift_size=0 and attention
computed purely between each query token and the ``n_centers`` cluster
centres (no window-internal interactions, no relative bias, no mask on the
cluster branch — reference ``:227-260``), the swin window partition /
padding / reverse dance in the reference is mathematically a no-op. The
whole layer collapses to per-token cross-attention over the centres plus the
standard pre-norm MLP block, which is exactly what we implement: one dense
(B, H·W, C) × (B, n_centers, C) attention — small, static, MXU-shaped.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from .mit import _dense_init

__all__ = ["ClusterDecoder"]


class ClusterCrossAttention(nn.Module):
    """q from tokens, k/v from cluster centres (reference ``:209-262``)."""

    dim: int
    num_heads: int
    qkv_bias: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(
        self, x: jnp.ndarray, centers: jnp.ndarray, mask: jnp.ndarray | None = None
    ) -> jnp.ndarray:
        c = self.dim
        nh = self.num_heads
        hd = c // nh
        scale = hd**-0.5
        b, n, _ = x.shape

        # reference uses the full qkv Linear but consumes only q (``:220-227``)
        q = nn.Dense(3 * c, use_bias=self.qkv_bias, kernel_init=_dense_init,
                     dtype=self.dtype, name="qkv")(x)[..., :c]
        kv = nn.Dense(2 * c, use_bias=self.qkv_bias, kernel_init=_dense_init,
                      dtype=self.dtype, name="qkv_cluster")(centers)
        k, v = jnp.split(kv, 2, axis=-1)

        qh = q.reshape(b, n, nh, hd)
        kh = k.reshape(b, -1, nh, hd)
        vh = v.reshape(b, -1, nh, hd)
        attn = jnp.einsum("bqhd,bkhd->bhqk", qh * scale, kh).astype(jnp.float32)
        if mask is not None:
            # padded (invalid) centres get zero softmax weight — identical to
            # the reference's variable-count attention over the valid subset
            attn = jnp.where(mask[:, None, None, :], attn, -jnp.inf)
        attn = jax.nn.softmax(attn, axis=-1).astype(self.dtype)
        out = jnp.einsum("bhqk,bkhd->bqhd", attn, vh).reshape(b, n, c)
        return nn.Dense(c, kernel_init=_dense_init, dtype=self.dtype, name="proj_cluster")(out)


class ClusterDecoder(nn.Module):
    """One pre-norm block: cross-attend to centres, then MLP.

    Input (B, H, W, C) features and (B, n_centers, C) centres — or a
    ``(centers, mask)`` tuple where ``mask`` (B, n_centers) bool marks valid
    rows (padded variable-count centre sets, reference ``cffm_head.py:444-452``
    keeps a random 80% subset of concatenated per-video centre files; we pad
    to a static count and mask instead of resampling). Output (B, H, W, C).
    Both the tokens and the centres pass through the *same* ``norm1``
    (reference ``SwinTransformerBlock_cluster.forward:616-622``).
    """

    dim: int
    num_heads: int = 8
    mlp_ratio: float = 4.0
    norm_eps: float = 1e-5
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(
        self, x: jnp.ndarray, centers: jnp.ndarray, deterministic: bool = True
    ) -> jnp.ndarray:
        mask = None
        if isinstance(centers, (tuple, list)):
            centers, mask = centers
        b, h, w, c = x.shape
        tokens = x.reshape(b, h * w, c)
        shortcut = tokens
        norm1 = nn.LayerNorm(epsilon=self.norm_eps, dtype=self.dtype, name="norm1")
        tokens = norm1(tokens)
        centers = norm1(centers)
        attn = ClusterCrossAttention(self.dim, self.num_heads, dtype=self.dtype, name="attn")(
            tokens, centers, mask
        )
        tokens = shortcut + attn
        hmid = nn.LayerNorm(epsilon=self.norm_eps, dtype=self.dtype, name="norm2")(tokens)
        hmid = nn.Dense(int(c * self.mlp_ratio), kernel_init=_dense_init, dtype=self.dtype,
                        name="mlp_fc1")(hmid)
        hmid = nn.gelu(hmid, approximate=False)
        hmid = nn.Dense(c, kernel_init=_dense_init, dtype=self.dtype, name="mlp_fc2")(hmid)
        tokens = tokens + hmid
        return tokens.reshape(b, h, w, c)
