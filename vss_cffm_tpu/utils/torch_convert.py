"""PyTorch checkpoint → flax params converter.

One-way bridge from the reference ecosystem (SURVEY §5 checkpoint/resume):

- ``convert_backbone``: SegFormer ``mit_bX.pth`` pretrained weights
  (the reference loads them with ``strict=False``,
  ``mix_transformer.py:276-279``);
- ``convert_segmentor``: a full reference CFFM/CFFM++ checkpoint
  (``state_dict`` with ``backbone.`` / ``decode_head.`` prefixes) into our
  ``{params, batch_stats}`` variables for checkpoint-parity validation.

Layout mapping (torch → flax):
  Linear  (out, in)        → kernel (in, out)
  Conv2d  (out, in, kh, kw) → kernel (kh, kw, in, out)   [NHWC]
  Depthwise Conv (C, 1, k, k) → (k, k, 1, C)
  LayerNorm/BatchNorm weight → scale;  BN running stats → batch_stats.

Tensors arrive as numpy (use ``load_torch_state_dict`` — torch.load with
CPU map_location — or any dict of numpy arrays).
"""

from __future__ import annotations

from typing import Any, Mapping

import numpy as np

__all__ = ["load_torch_state_dict", "convert_backbone", "convert_segmentor"]


def load_torch_state_dict(path: str) -> dict[str, np.ndarray]:
    import torch

    obj = torch.load(path, map_location="cpu", weights_only=False)
    sd = obj.get("state_dict", obj) if isinstance(obj, dict) else obj
    return {k: v.numpy() if hasattr(v, "numpy") else np.asarray(v) for k, v in sd.items()}


def _linear(sd, prefix) -> dict:
    out = {"kernel": sd[f"{prefix}.weight"].T.copy()}
    if f"{prefix}.bias" in sd:
        out["bias"] = sd[f"{prefix}.bias"].copy()
    return out


def _conv(sd, prefix) -> dict:
    w = sd[f"{prefix}.weight"]
    out = {"kernel": np.transpose(w, (2, 3, 1, 0)).copy()}
    if f"{prefix}.bias" in sd:
        out["bias"] = sd[f"{prefix}.bias"].copy()
    return out


def _dwconv(sd, prefix) -> dict:
    w = sd[f"{prefix}.weight"]  # (C, 1, kh, kw)
    return {
        "kernel": np.transpose(w, (2, 3, 1, 0)).copy(),  # (kh, kw, 1, C)
        "bias": sd[f"{prefix}.bias"].copy(),
    }


def _norm(sd, prefix) -> dict:
    return {"scale": sd[f"{prefix}.weight"].copy(), "bias": sd[f"{prefix}.bias"].copy()}


def convert_backbone(sd: Mapping[str, np.ndarray], depths: tuple[int, ...]) -> dict:
    """mit_bX state dict (no prefix) → flax backbone params."""
    p: dict[str, Any] = {}
    for s in range(4):
        i = s + 1
        p[f"patch_embed{i}"] = {
            "proj": _conv(sd, f"patch_embed{i}.proj"),
            "norm": _norm(sd, f"patch_embed{i}.norm"),
        }
        for j in range(depths[s]):
            attn = {
                "q": _linear(sd, f"block{i}.{j}.attn.q"),
                "kv": _linear(sd, f"block{i}.{j}.attn.kv"),
                "proj": _linear(sd, f"block{i}.{j}.attn.proj"),
            }
            if f"block{i}.{j}.attn.sr.weight" in sd:
                attn["sr"] = _conv(sd, f"block{i}.{j}.attn.sr")
                attn["norm"] = _norm(sd, f"block{i}.{j}.attn.norm")
            p[f"block{i}_{j}"] = {
                "norm1": _norm(sd, f"block{i}.{j}.norm1"),
                "attn": attn,
                "norm2": _norm(sd, f"block{i}.{j}.norm2"),
                "mlp": {
                    "fc1": _linear(sd, f"block{i}.{j}.mlp.fc1"),
                    "dwconv": _dwconv(sd, f"block{i}.{j}.mlp.dwconv.dwconv"),
                    "fc2": _linear(sd, f"block{i}.{j}.mlp.fc2"),
                },
            }
        p[f"norm{i}"] = _norm(sd, f"norm{i}")
    return p


def _cffm_attention(sd, prefix, focal_level: int, n_clip_levels: int) -> dict:
    attn = {
        "qkv_kernel": sd[f"{prefix}.qkv.weight"].T.copy(),
        "proj": _linear(sd, f"{prefix}.proj"),
        "relative_position_bias_table": sd[f"{prefix}.relative_position_bias_table"].copy(),
        # reference shape (1, nH, 49, n) → ours (nH, 49, n)
        "relative_position_bias_to_neighbors": sd[
            f"{prefix}.relative_position_bias_table_to_neighbors"
        ][0].copy(),
    }
    if f"{prefix}.qkv.bias" in sd:
        attn["qkv_bias"] = sd[f"{prefix}.qkv.bias"].copy()
    for k in range(focal_level - 1):
        attn[f"relative_position_bias_to_windows_{k}"] = sd[
            f"{prefix}.relative_position_bias_table_to_windows.{k}"
        ].copy()
    for k in range(n_clip_levels):
        attn[f"relative_position_bias_to_windows_clips_{k}"] = sd[
            f"{prefix}.relative_position_bias_table_to_windows_clips.{k}"
        ].copy()
    return attn


def _cffm_block(sd, prefix, focal_level: int, n_clip_levels: int) -> dict:
    blk = {
        "norm1": _norm(sd, f"{prefix}.norm1"),
        "norm2": _norm(sd, f"{prefix}.norm2"),
        "attn": _cffm_attention(sd, f"{prefix}.attn", focal_level, n_clip_levels),
        "mlp": {
            "fc1": _linear(sd, f"{prefix}.mlp.fc1"),
            "fc2": _linear(sd, f"{prefix}.mlp.fc2"),
        },
    }
    for k in range(focal_level - 1):
        blk[f"pool_layers_{k}"] = {
            "kernel": sd[f"{prefix}.pool_layers.{k}.weight"].T.copy(),
            "bias": sd[f"{prefix}.pool_layers.{k}.bias"].copy(),
        }
    for k in range(n_clip_levels):
        blk[f"pool_layers_clips_{k}"] = {
            "kernel": sd[f"{prefix}.pool_layers_clips.{k}.weight"].T.copy(),
            "bias": sd[f"{prefix}.pool_layers_clips.{k}.bias"].copy(),
        }
    return blk


def convert_segmentor(sd: Mapping[str, np.ndarray], config) -> dict:
    """Full reference checkpoint → ``{"params": ..., "batch_stats": ...}``.

    ``config`` is our ``SegmentorConfig`` (decoder depth / focal levels read
    from it).
    """
    head_cfg = config.head
    dec = head_cfg.decoder
    params: dict[str, Any] = {
        "backbone": convert_backbone(
            {k[len("backbone."):]: v for k, v in sd.items() if k.startswith("backbone.")},
            config.backbone_config.depths,
        )
    }
    h = "decode_head"
    head: dict[str, Any] = {
        "decode": {
            **{
                f"linear_c{i}": {"proj": _linear(sd, f"{h}.linear_c{i}.proj")}
                for i in (1, 2, 3, 4)
            },
            # torch conv (f, 4f, 1, 1) → merged fuse matmul kernel (4f, f)
            "fuse_kernel": sd[f"{h}.linear_fuse.conv.weight"][:, :, 0, 0].T.copy(),
            "bn": _norm(sd, f"{h}.linear_fuse.bn"),
        },
        "linear_pred": _conv(sd, f"{h}.linear_pred"),
        "linear_pred2": _conv(sd, f"{h}.linear_pred2"),
        "decoder_focal": {
            f"blocks_{i}": _cffm_block(
                sd, f"{h}.decoder_focal.blocks.{i}", dec.focal_level, len(dec.focal_l_clips)
            )
            for i in range(dec.depth)
        },
    }
    if head_cfg.mode == "finetune" and f"{h}.linear_pred3.weight" in sd:
        sw = f"{h}.decoder_swin.blocks.0"
        head["linear_pred3"] = _conv(sd, f"{h}.linear_pred3")
        head["decoder_swin"] = {
            "norm1": _norm(sd, f"{sw}.norm1"),
            "norm2": _norm(sd, f"{sw}.norm2"),
            "attn": {
                "qkv": _linear(sd, f"{sw}.attn.qkv"),
                "qkv_cluster": _linear(sd, f"{sw}.attn.qkv_cluster"),
                "proj_cluster": _linear(sd, f"{sw}.attn.proj_cluster"),
            },
            "mlp_fc1": _linear(sd, f"{sw}.mlp.fc1"),
            "mlp_fc2": _linear(sd, f"{sw}.mlp.fc2"),
        }
    params["decode_head"] = head

    batch_stats = {
        "decode_head": {
            "decode": {
                "bn": {
                    "mean": sd[f"{h}.linear_fuse.bn.running_mean"].copy(),
                    "var": sd[f"{h}.linear_fuse.bn.running_var"].copy(),
                }
            }
        }
    }
    return {"params": params, "batch_stats": batch_stats}
