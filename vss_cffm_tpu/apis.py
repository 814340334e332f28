"""High-level inference API (parity with ``mmseg/apis/inference.py``).

- ``init_segmentor(config, checkpoint)`` ≙ reference ``:11-38``: builds the
  model from a config path (or ExperimentConfig) and loads weights — either
  an orbax checkpoint directory or a converted PyTorch ``.pth``.
- ``inference_segmentor(model_bundle, imgs)`` ≙ ``:76-103``: takes one image
  path/array (single-frame SegFormer path) or a list of frame paths (clip
  path), runs the eval pipeline (AlignedResize /32 + normalize), returns the
  per-frame mask as numpy (H, W) int.
- ``show_result`` ≙ ``base.py:241-303``: palette overlay blend.
"""

from __future__ import annotations

import dataclasses
import cv2
import jax
import jax.numpy as jnp
import numpy as np

from .config import ExperimentConfig, load_config
from .data import transforms as T
from .data.palette import VSPW_PALETTE
from .models.segmentor import build_segmentor
from .ops.resize import resize_bilinear

__all__ = ["init_segmentor", "inference_segmentor", "show_result"]


@dataclasses.dataclass
class SegmentorBundle:
    model: object  # CFFMSegmentor | ImageSegmentor
    params: dict
    batch_stats: dict
    cfg: ExperimentConfig


def init_segmentor(config, checkpoint: str | None = None, dtype=jnp.bfloat16) -> SegmentorBundle:
    cfg = load_config(config) if isinstance(config, str) else config
    model = build_segmentor(cfg.model, dtype=dtype)
    if cfg.model.arch == "image":
        sample = jnp.zeros((1, *cfg.data.crop_size, 3), jnp.float32)
    else:
        t = len(cfg.data.dilation) + 1
        sample = jnp.zeros((1, t, *cfg.data.crop_size, 3), jnp.float32)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), sample)
    params, batch_stats = variables["params"], variables.get("batch_stats", {})

    if checkpoint is not None:
        if checkpoint.endswith((".pth", ".pt")):
            from .utils.torch_convert import convert_segmentor, load_torch_state_dict

            converted = convert_segmentor(load_torch_state_dict(checkpoint), cfg.model)
            params, batch_stats = converted["params"], converted["batch_stats"]
        else:
            from .train import CheckpointManager, TrainState, build_optimizer

            tx = build_optimizer(params, cfg.optim)
            state = TrainState.create({"params": params, "batch_stats": batch_stats}, tx)
            params, batch_stats = CheckpointManager(checkpoint).load_params(state)
    return SegmentorBundle(model, params, batch_stats, cfg)


def _prepare_frames(imgs, img_scale) -> np.ndarray:
    frames = []
    for im in imgs:
        if isinstance(im, str):
            im = cv2.imread(im, cv2.IMREAD_COLOR)
        frames.append(im)
    frames, _ = T.aligned_resize_clip(frames, None, img_scale)
    return np.stack(T.normalize_clip(frames)).astype(np.float32)


def inference_segmentor(bundle: SegmentorBundle, imgs) -> np.ndarray:
    """imgs: one path/array or a list of frame paths/arrays (a clip whose
    last element is the target frame). Returns the (H, W) int mask at the
    original resolution of the target frame."""
    if isinstance(imgs, (str, np.ndarray)):
        imgs = [imgs]
    first = imgs[0]
    ori = (cv2.imread(first).shape[:2] if isinstance(first, str) else first.shape[:2])
    clip = _prepare_frames(imgs, bundle.cfg.data.img_scale)
    image_mode = bundle.cfg.model.arch == "image"
    if image_mode:
        clip = clip[-1]  # single frame (H, W, 3)

    @jax.jit
    def forward(params, batch_stats, x):
        logits = bundle.model.apply({"params": params, "batch_stats": batch_stats},
                                    x[None], False)
        logits = resize_bilinear(logits, x.shape[-3:-1])
        logits = resize_bilinear(logits, ori)
        return jnp.argmax(logits, axis=-1)[0]  # softmax is argmax-invariant

    return np.asarray(forward(bundle.params, bundle.batch_stats, jnp.asarray(clip)))


def show_result(img, seg: np.ndarray, palette=VSPW_PALETTE, opacity: float = 0.5) -> np.ndarray:
    """Blend a color-coded mask over the image (reference ``base.py:241-303``)."""
    if isinstance(img, str):
        img = cv2.imread(img, cv2.IMREAD_COLOR)
    color = np.zeros((*seg.shape, 3), np.uint8)
    for cls, rgb in enumerate(palette):
        color[seg == cls] = rgb[::-1]  # BGR for cv2 output parity
    out = img * (1 - opacity) + color * opacity
    return out.astype(np.uint8)
