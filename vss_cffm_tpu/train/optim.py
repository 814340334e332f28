"""Optimizer + LR schedule with mmcv paramwise semantics over optax.

Reproduces the reference training recipe
(``local_configs/cffm/B1/cffm.b1.480x480.vspw2.160k.py:35-45``):

- AdamW, lr 6e-5, betas (0.9, 0.999), weight-decay 0.01;
- ``paramwise_cfg.custom_keys``: parameters whose name contains ``head`` get
  lr×10, parameters whose name contains ``norm`` or ``pos_block`` get
  weight-decay×0 — mmcv's ``DefaultOptimizerConstructor`` substring matching;
- poly LR: ``lr · (1 − iter/max_iter)^power`` with ``power=1.0``, plus a
  1500-iter linear warmup from ``lr · warmup_ratio`` (mmcv ``PolyLrUpdaterHook``).

Implemented the optax way: one ``optax.adamw`` with a weight-decay mask and
an ``optax.multi_transform``-free lr scaling via a per-leaf multiplier
(scale applied after the schedule), so the whole update stays a single
fused transform chain.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable

import jax
import jax.numpy as jnp
import optax

__all__ = ["OptimConfig", "poly_schedule", "build_optimizer", "paramwise_multipliers"]


@dataclasses.dataclass(frozen=True)
class OptimConfig:
    lr: float = 6e-5
    betas: tuple[float, float] = (0.9, 0.999)
    weight_decay: float = 0.01
    max_iters: int = 160_000
    power: float = 1.0
    min_lr: float = 0.0
    warmup_iters: int = 1500
    warmup_ratio: float = 1e-6
    head_lr_mult: float = 10.0  # finetune config uses 1.0 (``fine_w_proto:38``)
    grad_clip: float | None = None


def poly_schedule(cfg: OptimConfig) -> Callable[[jnp.ndarray], jnp.ndarray]:
    """mmcv poly-with-linear-warmup.

    Warmup (iter < warmup_iters): ``lr_t = lr_poly(t) * (1 - (1-k)*(1-t/w))``
    with ``k = warmup_ratio`` — mmcv scales the *regular* lr at t, which during
    warmup is the poly value at t.
    """

    def schedule(step):
        t = jnp.asarray(step, jnp.float32)
        frac = 1.0 - t / cfg.max_iters
        poly = (cfg.lr - cfg.min_lr) * jnp.maximum(frac, 0.0) ** cfg.power + cfg.min_lr
        if cfg.warmup_iters <= 0:
            return poly
        warm_frac = jnp.minimum(t / cfg.warmup_iters, 1.0)
        warm_scale = 1.0 - (1.0 - cfg.warmup_ratio) * (1.0 - warm_frac)
        return poly * warm_scale

    return schedule


def _name_of(path) -> str:
    return "/".join(str(getattr(k, "key", k)) for k in path)


def paramwise_multipliers(
    params, head_lr_mult: float
) -> tuple[Any, Any]:
    """(lr_mult tree, wd_mask tree) following mmcv custom_keys FIRST-MATCH rules.

    mmcv's ``DefaultOptimizerConstructor`` sorts ``custom_keys`` alphabetically
    then by length descending and applies only the FIRST key whose substring
    matches the parameter name. For the reference recipe
    ``{'head': lr×10, 'norm': wd×0, 'pos_block': wd×0}`` the order is
    ``[pos_block, head, norm]``, so:

    - every decode-head parameter (name contains 'head') matches 'head' and
      keeps its weight decay — including the head's LayerNorms and the
      linear_fuse BN (the reference genuinely decays them);
    - only *backbone* norm parameters (LayerNorm scale/bias; the SRA
      ``attn.norm``; patch-embed norms) match 'norm' and get decay 0;
    - 'pos_block' never matches anything in MiT (no positional blocks).

    Every parameter *bias* is still decayed in mmcv (no bias exemption in
    this config) — we mirror that.
    """

    def classify(path):
        name = _name_of(path)
        if "pos_block" in name:  # decay_mult 0, default lr
            return 1.0, False
        if "head" in name:  # lr_mult, default decay (→ decayed!)
            return head_lr_mult, True
        if "norm" in name:  # decay_mult 0
            return 1.0, False
        return 1.0, True

    lr_tree = jax.tree_util.tree_map_with_path(lambda p, _: classify(p)[0], params)
    wd_tree = jax.tree_util.tree_map_with_path(lambda p, _: classify(p)[1], params)
    return lr_tree, wd_tree


def build_optimizer(params, cfg: OptimConfig) -> optax.GradientTransformation:
    schedule = poly_schedule(cfg)
    lr_tree, wd_mask = paramwise_multipliers(params, cfg.head_lr_mult)

    def scale_by_mult(mults):
        def update_fn(updates, state, params=None):
            return jax.tree.map(lambda u, m: u * m, updates, mults), state

        return optax.GradientTransformation(lambda _: optax.EmptyState(), update_fn)

    chain = []
    if cfg.grad_clip is not None:
        chain.append(optax.clip_by_global_norm(cfg.grad_clip))
    chain += [
        optax.scale_by_adam(b1=cfg.betas[0], b2=cfg.betas[1], eps=1e-8),
        # mmcv AdamW: wd applied on the *scheduled, per-group* lr; optax
        # add_decayed_weights adds wd*param to updates before lr scaling,
        # which matches torch.optim.AdamW (decay ∝ group lr). Group lr mult
        # must therefore apply after wd is added.
        optax.add_decayed_weights(cfg.weight_decay, mask=wd_mask),
        scale_by_mult(lr_tree),
        optax.scale_by_learning_rate(schedule),
    ]
    return optax.chain(*chain)
