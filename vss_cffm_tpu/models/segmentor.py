"""Segmentors: clip (video) and single-image encoder-decoders.

Re-design of the reference segmentors
(``mmseg/models/segmentors/encoder_decoder.py``):

- ``CFFMSegmentor`` ≙ ``EncoderDecoder_clips`` (``:295-591``): training
  flattens the (B, T) clip into a (B·T) frame batch through the backbone
  (``:436-441``) — frames are embarrassingly parallel until the CFFM block —
  and threads (batch_size, num_clips) into the clip head.
- ``ImageSegmentor`` ≙ ``EncoderDecoder`` (``:13-293``) with a SegFormer
  head — the single-frame zoo surface.

These are pure flax modules: train/test drivers (loss, softmax/flip/argmax
TTA, sliding window) live in ``train/`` and ``eval/`` as jitted functions.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import flax.linen as nn
import jax.numpy as jnp

from .heads import CFFMHead, CFFMHeadConfig, SegFormerHead
from .mit import MIT_VARIANTS, MiT, MiTConfig

__all__ = [
    "TestConfig",
    "SegmentorConfig",
    "CFFMSegmentor",
    "ImageSegmentor",
    "build_model_config",
    "build_segmentor",
]


@dataclasses.dataclass(frozen=True)
class TestConfig:
    """Inference-mode selection ≙ the reference's ``test_cfg``
    (``encoder_decoder.py:457-500``): 'whole' (every live CFFM config) or
    'slide' with crop/stride windows whose probabilities are averaged."""

    mode: str = "whole"  # 'whole' | 'slide'
    crop_size: tuple[int, int] = (480, 480)
    stride: tuple[int, int] = (320, 320)


@dataclasses.dataclass(frozen=True)
class SegmentorConfig:
    backbone: str = "mit_b1"
    head: CFFMHeadConfig = dataclasses.field(default_factory=CFFMHeadConfig)
    arch: str = "cffm"  # "cffm" (clip) | "image" (single-frame SegFormer)
    # backbone dwconv implementation override: None = auto (Pallas on TPU)
    dwconv_impl: str | None = None
    # backbone patch-embed implementation: None = strided conv; "im2col" =
    # conv-free slices+dense (see models/mit.py:_Im2ColConv); a 4-tuple
    # selects per stage. Default: im2col at stage 1 only — the measured
    # end-to-end winner (tools/bench_stage_block.py --e2e, round 4): a conv
    # HLO at stage 1 makes XLA re-layout the whole 1/4-scale stage around
    # any fused Pallas block downstream (−90 fps), and row-phase im2col is
    # within 60 µs of the conv emitter in isolation.
    embed_impl: str | tuple | None = ("im2col", None, None, None)
    # backbone whole-block fusion at inference: None = composed path;
    # "fused" = ops/stage_block.py megakernel; a 4-tuple selects per stage.
    # Default: fuse stages 2+3 only — per-stage isolation (DEVELOPMENT.md
    # round-4 table) shows 0.70-0.71× there, a tie at stage 1 (VPU-bound
    # either way) and a loss at stage 4; end-to-end matrix: 286.6 fps vs
    # 245.0 composed at B1 480². Inference-only (no VJP) — the dispatch
    # gates on `deterministic`, so training always takes the composed path.
    block_impl: str | tuple | None = (None, "fused", "fused", None)
    # TRAINING-path block fusion. "full" = the whole block (both halves) as
    # a differentiable Pallas pair (ops/stage_block.mit_block_train:
    # megakernel forward + recompute-from-x backward emitting dx, dK/dV and
    # every parameter gradient); "ffn" = only the FFN half
    # (ops/mixffn.block_ffn_train). Default: "full" at stages 1-3, composed
    # at stage 4 (its 225-token grid is too small to beat XLA's flat
    # matmuls: full-everywhere measured 147.3 vs 143.9 ms). Measured B=8
    # 480² step: 176.8 (r4) → 168.9 (CE kernels) → 150.0 (ffn 1-3) →
    # 143.9 ms (this default); see DEVELOPMENT.md "Round-5 train attack".
    train_block_impl: str | tuple | None = ("full", "full", "full", None)
    test_cfg: TestConfig = dataclasses.field(default_factory=TestConfig)

    @property
    def backbone_config(self) -> MiTConfig:
        return dataclasses.replace(MIT_VARIANTS[self.backbone],
                                   dwconv_impl=self.dwconv_impl,
                                   embed_impl=self.embed_impl,
                                   block_impl=self.block_impl,
                                   train_block_impl=self.train_block_impl)


def build_segmentor(config: "SegmentorConfig", dtype=jnp.float32):
    """Factory: the (tiny) registry replacing mmseg's string dispatch."""
    if config.arch == "image":
        return ImageSegmentor(config, dtype)
    return CFFMSegmentor(config, dtype)


def build_model_config(variant: str = "b1", num_classes: int = 124, num_clips: int = 4,
                       mode: str = "cffm") -> SegmentorConfig:
    """CFFM-Bx configs mirroring ``local_configs/cffm/B{0,1,2,5}/*`` —
    decoder depth per variant: B0=1, B1/B2=2, B5=4 (SURVEY §6)."""
    from .cffm_transformer import CFFMDecoderConfig

    depths = {"b0": 1, "b1": 2, "b2": 2, "b5": 4}[variant]
    backbone = f"mit_{variant}"
    in_channels = tuple(MIT_VARIANTS[backbone].embed_dims)
    # Inference K/V layout for the fused CFM kernel is a whole-graph XLA
    # layout question and flips per variant — measured end-to-end at the
    # deployed 480×864 geometry (DEVELOPMENT.md "CFM inference K/V layout"):
    # B0 grouped 217.4 vs packed 196.5 fps; B1 packed 133.1 vs 127.7.
    kv_layout = {"b0": "grouped", "b1": "packed", "b2": "packed",
                 "b5": "packed"}[variant]
    head = CFFMHeadConfig(
        in_channels=in_channels,
        embed_dim=256,
        num_classes=num_classes,
        num_clips=num_clips,
        decoder=CFFMDecoderConfig(dim=256, depth=depths,
                                  infer_kv_layout=kv_layout),
        mode=mode,
    )
    return SegmentorConfig(backbone=backbone, head=head)


class CFFMSegmentor(nn.Module):
    """Video clip segmentor: MiT backbone + CFFM clip head."""

    config: SegmentorConfig
    dtype: Any = jnp.float32

    def setup(self):
        self.backbone = MiT(self.config.backbone_config, self.dtype)
        self.decode_head = CFFMHead(self.config.head, self.dtype)

    def __call__(
        self,
        imgs: jnp.ndarray,  # (B, T, H, W, 3)
        train: bool = False,
        cluster_centers: jnp.ndarray | None = None,
    ) -> jnp.ndarray:
        b, t, h, w, c = imgs.shape
        flat = imgs.reshape(b * t, h, w, c)
        feats = self.backbone(flat, deterministic=not train)
        return self.decode_head(feats, b, t, train, cluster_centers)

    def frame_features(self, frames: jnp.ndarray) -> jnp.ndarray:
        """Per-frame fused 1/4 features (B, h/4, w/4, embed_dim) — the
        cacheable prefix of eval inference (backbone + per-frame decode)."""
        feats = self.backbone(frames, deterministic=True)
        return self.decode_head.decode(feats, False)

    def predict_from_features(
        self,
        fused: jnp.ndarray,  # (B, T, h/4, w/4, embed_dim)
        cluster_centers: jnp.ndarray | None = None,
    ) -> jnp.ndarray:
        """Eval logits from cached per-frame features."""
        b, t = fused.shape[:2]
        flat = fused.reshape((b * t,) + fused.shape[2:])
        return self.decode_head.forward_fused(flat, b, t, False, cluster_centers)

    def prototype_features(self, imgs: jnp.ndarray) -> jnp.ndarray:
        """Fused 1/8 features of each frame, for CFFM++ phase-A k-means.

        imgs (B, T, H, W, 3) -> (B, T, h/8, w/8, embed_dim).
        """
        b, t, h, w, c = imgs.shape
        feats = self.backbone(imgs.reshape(b * t, h, w, c), deterministic=True)
        fused = self.decode_head.fused_features(feats)
        return fused.reshape(b, t, *fused.shape[1:])


class ImageSegmentor(nn.Module):
    """Single-frame encoder-decoder (SegFormer)."""

    config: SegmentorConfig
    dtype: Any = jnp.float32

    def setup(self):
        self.backbone = MiT(self.config.backbone_config, self.dtype)
        self.decode_head = SegFormerHead(self.config.head, self.dtype)

    def __call__(self, imgs: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        feats = self.backbone(imgs, deterministic=not train)
        return self.decode_head(feats, train)
