"""Decode heads: per-frame SegFormer MLP decoder + CFFM clip heads.

Re-design of the reference heads:

- ``SegFormerHead``      ≙ ``mmseg/models/decode_heads/segformer_head.py:37-90``
- ``CFFMHead``           ≙ ``CFFMHead_clips_resize1_8``
                           (``mmseg/models/decode_heads/cffm_head.py:41-157``)
- ``CFFMHead`` (finetune) ≙ ``CFFMHead_clips_resize1_8_finetune_w_prototype3``
                           (``cffm_head.py:304-536``)
- prototype feature extraction for CFFM++ phase A
                           (``cffm_head.py:161-301``; the k-means itself lives
                           in ``ops/kmeans.py`` and runs in the eval driver)

Layout is NHWC; all per-frame work runs on the flattened (B·T) frame batch so
the MXU sees one large batch. The fuse layer's SyncBN becomes a plain
BatchNorm whose batch statistics are computed over the *global* batch: under
jit with a sharded batch axis, GSPMD inserts the cross-device all-reduce —
the exact analogue of the reference's NCCL SyncBN (``cffm_head.py:61-66``).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops.resize import resize_bilinear
from .cffm_transformer import CFFMDecoder, CFFMDecoderConfig
from .cluster_head import ClusterDecoder
from .losses import LossConfig
from .mit import _dense_init

__all__ = ["CFFMHeadConfig", "SegFormerHead", "CFFMHead"]

# reference ``decode_head.py:637-639``: conv_seg/linear_pred init normal(0, 0.01)
_pred_init = nn.initializers.normal(stddev=0.01)


@dataclasses.dataclass(frozen=True)
class CFFMHeadConfig:
    in_channels: tuple[int, ...] = (64, 128, 320, 512)
    embed_dim: int = 256
    num_classes: int = 124
    num_clips: int = 4
    dropout_ratio: float = 0.1
    decoder: CFFMDecoderConfig = dataclasses.field(
        default_factory=lambda: CFFMDecoderConfig(dim=256, depth=2)
    )
    # 'cffm' | 'finetune' — finetune adds the cluster cross-attention branch
    # and stop-gradients the CFFM path (``cffm_head.py:514-518``).
    mode: str = "cffm"
    cluster_blend: float = 0.5  # eval output x2 + blend*x3 (``cffm_head.py:532``)
    # ``loss_decode``/``sampler`` surface (reference ``decode_head.py:64-101``),
    # consumed by ``train.step.make_train_step``
    loss: LossConfig = dataclasses.field(default_factory=LossConfig)


class _Proj(nn.Module):
    """Linear projection with an optional *merged* second matmul.

    With ``post`` (f, f'): computes ``x @ (K @ post) + b @ post`` — the
    algebraic merge of this embedding with its slice of the downstream 1×1
    fuse conv (see ``_PerFrameDecoder``).
    """

    features: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, post: jnp.ndarray | None = None) -> jnp.ndarray:
        k = self.param("kernel", _dense_init, (x.shape[-1], self.features))
        b = self.param("bias", nn.initializers.zeros, (self.features,))
        k = k.astype(self.dtype)
        b = b.astype(self.dtype)
        if post is not None:
            return x.astype(self.dtype) @ (k @ post) + b @ post
        return x.astype(self.dtype) @ k + b


class MLPEmbed(nn.Module):
    """Per-level linear embedding (reference ``cffm_head.py:26-37``)."""

    embed_dim: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, post: jnp.ndarray | None = None) -> jnp.ndarray:
        return _Proj(self.embed_dim, self.dtype, name="proj")(x, post)


class _PerFrameDecoder(nn.Module):
    """Shared SegFormer MLP decode: project 4 levels, upsample to 1/4, fuse.

    TPU restructuring of the reference computation
    ``ConvModule(cat([resize(MLP(c4)), resize(MLP(c3)), resize(MLP(c2)),
    MLP(c1)]))`` (``cffm_head.py:105-119``): both the per-level embedding and
    the 1×1 fuse conv are linear over channels and commute with the (spatial,
    linear) bilinear resize, so

        Conv1x1(cat_i(resize_i(x_i @ A_i + b_i))) =
            Σ_i resize_i(x_i @ (A_i F_i) + b_i F_i)

    where ``F_i`` is the fuse kernel's slice for level i. The merged form
    runs each level's matmul at its *low* resolution, eliminating both the
    4×embed-dim concat tensor (118 MB at 480², the largest intermediate in
    the model) and the 30-GFLOP full-width fuse conv. Exact in f32; in bf16
    it differs only by matmul rounding. BN + ReLU follow as in the
    reference's ConvModule (SyncBN ≡ global-batch BN under the mesh).
    """

    embed_dim: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feats: Sequence[jnp.ndarray], train: bool = False) -> jnp.ndarray:
        c1, c2, c3, c4 = feats
        size = c1.shape[1:3]
        f = self.embed_dim
        # fuse kernel rows ordered [c4, c3, c2, c1] (the reference concat order)
        fuse_kernel = self.param(
            "fuse_kernel",
            nn.initializers.variance_scaling(1.0, "fan_out", "truncated_normal"),
            (4 * f, f),
        ).astype(self.dtype)
        acc = None
        for i, (x, name) in enumerate(
            [(c4, "linear_c4"), (c3, "linear_c3"), (c2, "linear_c2"), (c1, "linear_c1")]
        ):
            y = MLPEmbed(f, self.dtype, name=name)(x, fuse_kernel[i * f : (i + 1) * f])
            if y.shape[1:3] != tuple(size):
                y = resize_bilinear(y, size)
            acc = y if acc is None else acc + y
        _c = nn.BatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5,
            dtype=self.dtype, name="bn",
        )(acc)
        return nn.relu(_c)


class _Dropout2d(nn.Module):
    """torch nn.Dropout2d: drop whole channels (broadcast over H, W)."""

    rate: float

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        if self.rate <= 0.0:
            return x
        return nn.Dropout(self.rate, broadcast_dims=(1, 2))(x, deterministic=deterministic)


class SegFormerHead(nn.Module):
    """Single-frame SegFormer decode head (reference ``segformer_head.py``)."""

    cfg: CFFMHeadConfig
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feats: Sequence[jnp.ndarray], train: bool = False) -> jnp.ndarray:
        _c = _PerFrameDecoder(self.cfg.embed_dim, self.dtype, name="decode")(feats, train)
        x = _Dropout2d(self.cfg.dropout_ratio, name="dropout")(_c, deterministic=not train)
        return nn.Conv(
            self.cfg.num_classes, (1, 1), kernel_init=_pred_init, dtype=self.dtype,
            name="linear_pred",
        )(x)


class CFFMHead(nn.Module):
    """Clip decode head: per-frame logits + CFFM-refined last-frame logits.

    Inputs: 4 feature maps of the flattened frame batch, each
    (B*T, h_i, w_i, C_i). Returns:

    - train: (B, T+1, h, w, num_classes) — per-frame logits for all T frames
      plus the refined last frame (reference ``cffm_head.py:152``).
    - eval (T == num_clips): refined last-frame logits (B, h, w, num_classes)
      (``:154-155``); finetune mode blends the cluster branch (``:530-532``).
    - eval (T != num_clips): plain per-frame logits of the last frame
      (``:127-129``).

    ``cluster_centers`` (B, n_centers, C) is required in finetune mode.
    """

    cfg: CFFMHeadConfig
    dtype: Any = jnp.float32

    def setup(self):
        cfg = self.cfg
        self.decode = _PerFrameDecoder(cfg.embed_dim, self.dtype)
        self.dropout = _Dropout2d(cfg.dropout_ratio)
        self.linear_pred = nn.Conv(cfg.num_classes, (1, 1), kernel_init=_pred_init,
                                   dtype=self.dtype)
        self.decoder_focal = CFFMDecoder(cfg.decoder, self.dtype)
        self.dropout2 = _Dropout2d(cfg.dropout_ratio)
        self.linear_pred2 = nn.Conv(cfg.num_classes, (1, 1), kernel_init=_pred_init,
                                    dtype=self.dtype)
        if cfg.mode == "finetune":
            self.decoder_swin = ClusterDecoder(dim=cfg.embed_dim,
                                               num_heads=cfg.decoder.num_heads,
                                               dtype=self.dtype)
            self.dropout3 = _Dropout2d(cfg.dropout_ratio)
            self.linear_pred3 = nn.Conv(cfg.num_classes, (1, 1), kernel_init=_pred_init,
                                        dtype=self.dtype)

    def __call__(
        self,
        feats: Sequence[jnp.ndarray],
        batch_size: int,
        num_clips: int,
        train: bool = False,
        cluster_centers: jnp.ndarray | None = None,
    ) -> jnp.ndarray:
        _c = self.decode(feats, train and self.cfg.mode != "finetune")
        return self.forward_fused(_c, batch_size, num_clips, train, cluster_centers)

    def forward_fused(
        self,
        _c: jnp.ndarray,  # (B*T, h, w, embed_dim) per-frame fused features
        batch_size: int,
        num_clips: int,
        train: bool = False,
        cluster_centers: jnp.ndarray | None = None,
    ) -> jnp.ndarray:
        """Head forward from per-frame fused features.

        Split out from ``__call__`` so a streaming evaluator can cache the
        (backbone + per-frame decode) features of each video frame — in the
        reference eval protocol every frame is re-encoded up to 4× as it
        appears in successive clips' dilation windows.
        """
        cfg = self.cfg
        finetune = cfg.mode == "finetune"
        if finetune:
            # reference freezes linear_fuse in eval mode + detaches the CFFM
            # branch during finetune (``cffm_head.py:478-480, 514-518``)
            _c = jax.lax.stop_gradient(_c)

        h, w = _c.shape[1:3]
        x = self.dropout(_c, deterministic=not train)
        x = self.linear_pred(x)
        x = x.reshape(batch_size, num_clips, h, w, cfg.num_classes)

        if not train and num_clips != cfg.num_clips:
            return x[:, -1]

        h2, w2 = h // 2, w // 2
        _c8 = resize_bilinear(_c, (h2, w2))
        _c_further = _c8.reshape(batch_size, num_clips, h2, w2, cfg.embed_dim)
        _c2 = self.decoder_focal(_c_further, deterministic=not train)

        fused_last = jnp.concatenate([_c_further[:, -1], _c2[:, -1]], axis=-1)
        x2 = self.dropout2(fused_last, deterministic=not train)
        x2 = self.linear_pred2(x2)
        x2 = resize_bilinear(x2, (h, w))

        if not finetune:
            if not train:
                return x2
            return jnp.concatenate([x, x2[:, None]], axis=1)

        # ---- CFFM++ finetune: cluster cross-attention branch ---------------
        assert cluster_centers is not None, "finetune mode requires cluster centers"
        if train:
            _c_further = jax.lax.stop_gradient(_c_further)
            x = jax.lax.stop_gradient(x)
            x2 = jax.lax.stop_gradient(x2)
        _c3 = self.decoder_swin(_c_further[:, -1], cluster_centers, deterministic=not train)
        x3 = self.dropout3(_c3, deterministic=not train)
        x3 = self.linear_pred3(x3)
        x3 = resize_bilinear(x3, (h, w))

        if not train:
            return x2 + cfg.cluster_blend * x3
        return jnp.concatenate([x, x3[:, None]], axis=1)

    def fused_features(self, feats: Sequence[jnp.ndarray]) -> jnp.ndarray:
        """1/8-resolution fused features for prototype generation.

        Reference phase A pools the fused 1/4 features to 1/8 and k-means
        clusters them (``cffm_head.py:267-284``).
        """
        _c = self.decode(feats, False)
        h, w = _c.shape[1:3]
        return resize_bilinear(_c, (h // 2, w // 2))
