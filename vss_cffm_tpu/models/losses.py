"""Segmentation losses with mmseg-v0.13 reduction semantics.

Parity notes (reference ``mmseg/models/losses``):

- ``cross_entropy`` (``cross_entropy_loss.py:9-33`` + ``utils.py:26-56``):
  per-pixel CE with ``ignore_index`` pixels contributing 0 to the numerator
  but still counted in the ``mean`` denominator — i.e.
  ``sum(ce * valid) / num_all_pixels``, *not* ``/ num_valid``.
- ``accuracy`` (``accuracy.py:4-49``): top-1 match rate over *all* pixels —
  ignored pixels count as incorrect (no masking in the reference).
- ``clip_ce_loss`` (``decode_head.py:743-835``): the clip loss of
  ``BaseDecodeHead_clips_flow`` — splits (B, T', ...) logits against
  (B, T, ...) labels by the T'∈{T+1, T+3, 2T, 2T+1} case table, bilinearly
  upsamples logits to label resolution, and returns
  ``0.5·CE(per-frame) + 1.0·CE(refined-last)``.

Logits here are NHWC: (..., H, W, num_classes); labels are (..., H, W) int32.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp

from ..ops.resize import resize_bilinear
from ..ops import ce_upsampled as _ceu

__all__ = [
    "LossConfig",
    "make_clip_loss",
    "cross_entropy",
    "accuracy",
    "clip_ce_loss",
    "clip_ce_loss_city",
    "ohem_weight",
    "lovasz_softmax",
]


@dataclasses.dataclass(frozen=True)
class LossConfig:
    """The ``loss_decode``/``sampler`` surface of the reference head config
    (``decode_head.py:64-101``): every live CFFM config ships
    ``CrossEntropyLoss(loss_weight=1.0)`` with ``sampler=None``, but the
    reference accepts ``class_weight``/``loss_weight`` variants, a Lovász
    loss (``lovasz_loss.py:225``) and an OHEM pixel sampler
    (``ohem_pixel_sampler.py:44-63``). Consumed by ``make_clip_loss`` /
    ``train.step.make_train_step``.
    """

    type: str = "ce"  # 'ce' | 'lovasz'
    loss_weight: float = 1.0
    class_weight: tuple[float, ...] | None = None
    # OHEM pixel sampler (≙ sampler=dict(type='OHEMPixelSampler', ...))
    use_ohem: bool = False
    ohem_thresh: float = 0.7
    ohem_min_kept: int = 100000


def make_clip_loss(cfg: LossConfig, ignore_index: int = 255):
    """LossConfig → ``(seg_logits, seg_labels) -> {loss_seg, acc_seg}``."""
    if cfg.type == "lovasz":
        def lovasz_loss(seg_logits, seg_labels):
            return clip_lovasz_loss(seg_logits, seg_labels, ignore_index,
                                    loss_weight=cfg.loss_weight)
        return lovasz_loss
    if cfg.type != "ce":
        raise ValueError(f"unknown loss type {cfg.type!r}")
    cw = None if cfg.class_weight is None else jnp.asarray(cfg.class_weight, jnp.float32)
    return functools.partial(
        clip_ce_loss,
        ignore_index=ignore_index,
        use_ohem=cfg.use_ohem,
        ohem_cfg={"thresh": cfg.ohem_thresh, "min_kept": cfg.ohem_min_kept},
        class_weight=cw,
        loss_weight=cfg.loss_weight,
    )


def cross_entropy(
    logits: jnp.ndarray,
    labels: jnp.ndarray,
    ignore_index: int = 255,
    class_weight: jnp.ndarray | None = None,
    pixel_weight: jnp.ndarray | None = None,
    avg_factor: float | None = None,
) -> jnp.ndarray:
    """Mean CE over all pixels; ignored pixels contribute zero loss.

    TPU note: formulated as ``logsumexp − Σ(one_hot ⊙ logits)`` rather than
    ``take_along_axis(log_softmax)``. The label pick then fuses into a
    select-reduce over the class axis and the f32 upcasts fuse into the
    reductions; the gather formulation cost 140 ms/step at the CFFM train
    geometry (the single most expensive op in the program) and materialized
    the full f32 log-softmax tensor.
    """
    valid = labels != ignore_index
    safe_labels = jnp.where(valid, labels, 0)
    num_classes = logits.shape[-1]
    lse = jax.scipy.special.logsumexp(logits.astype(jnp.float32), axis=-1)
    class_ids = jnp.arange(num_classes, dtype=safe_labels.dtype)
    picked = jnp.where(safe_labels[..., None] == class_ids, logits.astype(jnp.float32), 0.0)
    x_label = jnp.sum(picked, axis=-1)
    nll = lse - x_label
    if class_weight is not None:
        nll = nll * class_weight[safe_labels]
    nll = jnp.where(valid, nll, 0.0)
    if pixel_weight is not None:
        nll = nll * pixel_weight
    if avg_factor is not None:
        return nll.sum() / avg_factor
    return nll.mean()


def accuracy(logits: jnp.ndarray, labels: jnp.ndarray) -> jnp.ndarray:
    """Top-1 accuracy in percent over all pixels (reference semantics)."""
    pred = jnp.argmax(logits, axis=-1)
    return 100.0 * jnp.mean((pred == labels).astype(jnp.float32))


def ohem_weight(
    logits: jnp.ndarray,
    labels: jnp.ndarray,
    ignore_index: int = 255,
    thresh: float = 0.7,
    min_kept: int = 100000,
) -> jnp.ndarray:
    """Online hard example mining pixel weights.

    TPU-native reformulation of ``OHEMPixelSampler``
    (``mmseg/core/seg/sampler/ohem_pixel_sampler.py:44-63``): instead of
    boolean indexing (dynamic shapes), returns a static-shape 0/1 weight map
    that keeps pixels whose gt-class probability is below the effective
    threshold ``max(thresh, sorted_valid_probs[min(batch_kept, n_valid-1)])``
    with ``batch_kept = min_kept * N`` (N = leading image count), exactly the
    reference indexing. Invalid pixels sort to +inf so the k-th entry of the
    full sort equals the k-th valid prob whenever ``k < n_valid``.
    """
    valid = labels != ignore_index
    safe = jnp.where(valid, labels, 0)
    prob = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
    gt_prob = jnp.take_along_axis(prob, safe[..., None], axis=-1)[..., 0]
    n_imgs = labels.shape[0] if labels.ndim > 2 else 1
    return _ohem_from_gt_prob(gt_prob, valid, thresh, min_kept, n_imgs)


def _ohem_from_gt_prob(gt_prob, valid, thresh: float, min_kept: int,
                       n_imgs: int) -> jnp.ndarray:
    """OHEM weight map from the gt-class probability (any pixel layout —
    the sort and threshold are permutation-invariant)."""
    gt_prob = jnp.where(valid, gt_prob, jnp.inf)
    flat = jnp.sort(gt_prob.reshape(-1))
    batch_kept = min_kept * n_imgs
    n_valid = jnp.sum(valid)
    k = jnp.clip(jnp.minimum(batch_kept, n_valid - 1), 0, flat.shape[0] - 1)
    min_threshold = jnp.where(n_valid > 0, jnp.take(flat, k), 0.0)
    eff_thresh = jnp.maximum(min_threshold, thresh)
    # sampler runs under no_grad in the reference; the boolean threshold has
    # no gradient path anyway — stop_gradient states the intent
    return jax.lax.stop_gradient(
        (valid & (gt_prob < eff_thresh)).astype(jnp.float32))


def lovasz_softmax(
    logits: jnp.ndarray,  # (..., H, W, C)
    labels: jnp.ndarray,  # (..., H, W)
    ignore_index: int = 255,
    classes: str = "present",
) -> jnp.ndarray:
    """Multi-class Lovász-Softmax loss (reference ``lovasz_loss.py:225``).

    TPU-native reformulation: instead of boolean-filtering ignored pixels
    (dynamic shapes), ignored pixels get zero error and are sorted to the
    end; the Lovász gradient is computed on the masked cumulative sums. Mean
    over classes present in the ground truth when ``classes='present'``.
    """
    c = logits.shape[-1]
    probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1).reshape(-1, c)
    flat_labels = labels.reshape(-1)
    valid = flat_labels != ignore_index
    safe = jnp.where(valid, flat_labels, 0)
    n_valid = jnp.sum(valid)

    def one_class(cls):
        fg = ((safe == cls) & valid).astype(jnp.float32)
        errors = jnp.abs(fg - probs[:, cls])
        errors = jnp.where(valid, errors, -1.0)  # ignored sort last
        order = jnp.argsort(-errors)
        errors_sorted = errors[order]
        fg_sorted = fg[order]
        valid_sorted = errors_sorted >= 0.0
        gts = jnp.sum(fg_sorted)
        inter = gts - jnp.cumsum(fg_sorted)
        union = gts + jnp.cumsum((1.0 - fg_sorted) * valid_sorted)
        jaccard = 1.0 - inter / jnp.maximum(union, 1e-12)
        grad = jnp.concatenate([jaccard[:1], jaccard[1:] - jaccard[:-1]])
        loss_c = jnp.sum(jnp.maximum(errors_sorted, 0.0) * grad * valid_sorted)
        present = gts > 0
        return loss_c, present

    losses, present = jax.vmap(one_class)(jnp.arange(c))
    if classes == "present":
        denom = jnp.maximum(jnp.sum(present), 1)
        return jnp.sum(jnp.where(present, losses, 0.0)) / denom
    return jnp.mean(losses)


def _flatten_frames(x: jnp.ndarray) -> jnp.ndarray:
    return x.reshape((-1,) + x.shape[2:])


def _phase_i32(labels: jnp.ndarray, s: int) -> jnp.ndarray:
    """``labels_to_phase`` with the transpose done — and kept — in uint8.

    Segmentation labels fit a byte (≤124 classes + 255 ignore); the phase
    transpose swaps the last two dims, which XLA materializes as a strided
    copy. Converting back to i32 here lets XLA fuse the widening INTO the
    transpose (observed: the s32-width relayout returned, ~3 ms at B=8), so
    the phase tensor stays u8 end-to-end and the CE kernels widen per-block
    in VMEM (their label reads are ``.astype(int32)``-wrapped)."""
    return _ceu.labels_to_phase(labels.astype(jnp.uint8), s)


# None = auto (fused Pallas CE on TPU when the geometry allows); tests set
# True (with ce_upsampled._INTERPRET) or False to pin a path.
_FORCE_FUSED: bool | None = None


def _fused_ce_applicable(logits: jnp.ndarray, labels: jnp.ndarray) -> bool:
    if _FORCE_FUSED is not None:
        return _FORCE_FUSED
    h, w = logits.shape[1:3]
    hh, ww = labels.shape[1:3]
    if h == 0 or w == 0 or hh % h or ww % w or hh // h != ww // w or hh // h < 2:
        return False
    ch = 8
    while ch > 1 and (h % ch or ch % 2):
        ch -= 1
    if ch < 2:  # backward kernel needs an even row-chunk divisor
        return False
    return jax.devices()[0].platform in ("tpu", "axon")


def _split_clip_cases(seg_logits, seg_labels):
    """The T'∈{T+1, T+3, 2T, 2T+1} case table of
    ``BaseDecodeHead_clips_flow.losses`` → (logit_ori, logit_last,
    label_ori, label_last), frame-flattened."""
    tp = seg_logits.shape[1]
    tl = seg_labels.shape[1]
    if tp == tl + 1:  # CFFM / CFFM++ train output
        logit_ori, logit_last = seg_logits[:, :-1], seg_logits[:, -1:]
        label_ori, label_last = seg_labels, seg_labels[:, -1:]
    elif tp == tl + 3:
        logit_ori, logit_last = seg_logits[:, :-3], seg_logits[:, -3:]
        label_ori = seg_labels
        label_last = jnp.concatenate([seg_labels[:, -1:]] * 3, axis=1)
    elif tp == 2 * tl:
        logit_ori, logit_last = seg_logits[:, :-1], seg_logits[:, -1:]
        label_ori = jnp.concatenate([seg_labels, seg_labels], axis=1)[:, :-1]
        label_last = seg_labels[:, -1:]
    elif tp == 2 * tl + 1:
        logit_ori, logit_last = seg_logits[:, :-2], seg_logits[:, -2:]
        label_ori = jnp.concatenate([seg_labels, seg_labels], axis=1)[:, :-1]
        label_last = jnp.concatenate([seg_labels[:, -1:]] * 2, axis=1)
    else:
        raise ValueError(f"unsupported logits/labels clip lengths {tp}/{tl}")
    return (_flatten_frames(logit_ori), _flatten_frames(logit_last),
            _flatten_frames(label_ori), _flatten_frames(label_last))


def clip_ce_loss(
    seg_logits: jnp.ndarray,  # (B, T', h, w, C)
    seg_labels: jnp.ndarray,  # (B, T, H, W) int32
    ignore_index: int = 255,
    use_ohem: bool = False,
    ohem_cfg: dict | None = None,
    class_weight: jnp.ndarray | None = None,
    loss_weight: float = 1.0,
) -> dict[str, jnp.ndarray]:
    """The clip loss case table of ``BaseDecodeHead_clips_flow.losses``:
    ``loss_weight·(0.5·CE(ori) + CE(last))`` with optional per-class weights
    (``cross_entropy_loss.py:141-200``) and the OHEM pixel sampler (the
    reference's clip-head ``sampler`` hook is dead code — it feeds the 5-d
    raw logits into a 4-d sampler and is ``None`` in every live config; here
    OHEM follows the image-path sampler semantics, per branch on the
    upsampled logits)."""
    logit_ori, logit_last, label_ori, label_last = _split_clip_cases(
        seg_logits, seg_labels)
    size = seg_labels.shape[2:4]

    if (_fused_ce_applicable(logit_ori, label_ori) and not use_ohem
            and class_weight is None):
        # v2 fully-reduced kernels: loss partial-sums and the correct-pixel
        # count come straight out of the forward kernel with static
        # per-segment weights — no (N, H, W)-scale intermediate (nll, pred,
        # lse, g_nll) ever reaches HBM, and the ori/last segments run as two
        # kernel calls instead of materializing a concatenated copy.
        s = label_ori.shape[1] // logit_ori.shape[1]
        p_ori = float(label_ori.size)
        p_last = float(label_last.size)
        wsum_o, corr = _ceu.ce_upsampled_loss(
            logit_ori, _phase_i32(label_ori, s), s, 0.5 / p_ori)
        wsum_l, _ = _ceu.ce_upsampled_loss(
            logit_last, _phase_i32(label_last, s), s, 1.0 / p_last,
            count_acc=False)
        return {"loss_seg": loss_weight * (wsum_o + wsum_l),
                "acc_seg": 100.0 * corr / p_ori}

    if _fused_ce_applicable(logit_ori, label_ori):
        # fused Pallas path: per-pixel NLL/argmax straight from the 1/4-res
        # logits; the upsampled (H, W, C) tensor never reaches HBM.
        # Identical semantics: CE sums masked NLL over *all* pixels, and
        # accuracy counts ignored pixels as incorrect (label 255 ≠ any pred).
        # class_weight scales nll by cw[label]; OHEM's gt-class probability
        # is exactly exp(−nll) (nll = lse − x_label), so the sampler needs no
        # extra softmax pass.
        s = label_ori.shape[1] // logit_ori.shape[1]
        n_ori = logit_ori.shape[0]
        logits_all = jnp.concatenate([logit_ori, logit_last], axis=0)
        labels_ph = _phase_i32(
            jnp.concatenate([label_ori, label_last], axis=0), s)
        nll, pred = _ceu.ce_upsampled_nll(logits_all, labels_ph, s)
        valid = labels_ph != ignore_index
        acc = 100.0 * jnp.mean(
            (pred[:n_ori] == labels_ph[:n_ori]).astype(jnp.float32))
        if use_ohem:
            cfg = ohem_cfg or {}
            w = jnp.concatenate([
                _ohem_from_gt_prob(jnp.exp(-nll[:n_ori]), valid[:n_ori],
                                   cfg.get("thresh", 0.7),
                                   cfg.get("min_kept", 100000), n_ori),
                _ohem_from_gt_prob(jnp.exp(-nll[n_ori:]), valid[n_ori:],
                                   cfg.get("thresh", 0.7),
                                   cfg.get("min_kept", 100000),
                                   nll.shape[0] - n_ori),
            ], axis=0)
            nll = nll * w
        if class_weight is not None:
            nll = nll * class_weight[jnp.where(valid, labels_ph, 0)]
        nll = jnp.where(valid, nll, 0.0)
        loss = loss_weight * (0.5 * nll[:n_ori].mean() + nll[n_ori:].mean())
        return {"loss_seg": loss, "acc_seg": acc}

    logit_ori = resize_bilinear(logit_ori, size)
    logit_last = resize_bilinear(logit_last, size)

    weight_ori = weight_last = None
    if use_ohem:
        weight_ori = ohem_weight(logit_ori, label_ori, ignore_index, **(ohem_cfg or {}))
        weight_last = ohem_weight(logit_last, label_last, ignore_index, **(ohem_cfg or {}))
    loss = 0.5 * cross_entropy(
        logit_ori, label_ori, ignore_index, class_weight, pixel_weight=weight_ori
    ) + cross_entropy(logit_last, label_last, ignore_index, class_weight,
                      pixel_weight=weight_last)
    return {
        "loss_seg": loss_weight * loss,
        "acc_seg": accuracy(logit_ori, label_ori),
    }


def clip_lovasz_loss(
    seg_logits: jnp.ndarray,
    seg_labels: jnp.ndarray,
    ignore_index: int = 255,
    loss_weight: float = 1.0,
) -> dict[str, jnp.ndarray]:
    """Clip case table with ``LovaszLoss`` as ``loss_decode``
    (``lovasz_loss.py:225``, multi_class, per_image=False)."""
    logit_ori, logit_last, label_ori, label_last = _split_clip_cases(
        seg_logits, seg_labels)
    size = seg_labels.shape[2:4]
    logit_ori = resize_bilinear(logit_ori, size)
    logit_last = resize_bilinear(logit_last, size)
    loss = 0.5 * lovasz_softmax(logit_ori, label_ori, ignore_index) + \
        lovasz_softmax(logit_last, label_last, ignore_index)
    return {
        "loss_seg": loss_weight * loss,
        "acc_seg": accuracy(logit_ori, label_ori),
    }


def clip_ce_loss_city(
    seg_logits: jnp.ndarray,  # (B, T+1, h, w, C)
    seg_labels: jnp.ndarray,  # (B, T, H, W)
    ignore_index: int = 255,
) -> dict[str, jnp.ndarray]:
    """``BaseDecodeHead_clips_flow_city.losses`` (reference
    ``decode_head.py:1041-1136``): only the last frame is supervised —
    0.5·CE(last per-frame logits) + CE(refined logits), both vs the last
    frame's label."""
    assert seg_logits.shape[1] == seg_labels.shape[1] + 1
    size = seg_labels.shape[2:4]
    label = seg_labels[:, -1]

    if _fused_ce_applicable(seg_logits[:, -2], label):
        # v2 fully-reduced kernels (see clip_ce_loss): both branches share
        # the last frame's label, so phase it once.
        s = label.shape[1] // seg_logits.shape[2]
        p = float(label.size)
        lbl_ph = _phase_i32(label, s)
        wsum_o, corr = _ceu.ce_upsampled_loss(seg_logits[:, -2], lbl_ph, s,
                                              0.5 / p)
        wsum_l, _ = _ceu.ce_upsampled_loss(seg_logits[:, -1], lbl_ph, s,
                                           1.0 / p, count_acc=False)
        return {"loss_seg": wsum_o + wsum_l, "acc_seg": 100.0 * corr / p}

    logit_ori = resize_bilinear(seg_logits[:, -2], size)
    logit_last = resize_bilinear(seg_logits[:, -1], size)
    loss = 0.5 * cross_entropy(logit_ori, label, ignore_index) + cross_entropy(
        logit_last, label, ignore_index
    )
    return {"loss_seg": loss, "acc_seg": accuracy(logit_ori, label)}
