"""CFFM cross-frame coarse-to-fine focal transformer — TPU-native.

Re-design of the reference decoder
(``mmseg/models/decode_heads/cffm_module/cffm_transformer.py``):

- ``CFFMBlock``  ≙ ``CffmTransformerBlock3d3`` (reference ``:629-856``)
- ``CFFMWindowAttention`` ≙ ``WindowAttention3d3`` (reference ``:221-626``)
- ``CFFMDecoder`` ≙ ``BasicLayer3d3`` (reference ``:859-935``)

Semantics: one block takes a 4-frame clip of 1/8-resolution features, pools
each frame into coarse "focal" windows (CFFA, reference ``:739-805``), and
lets every 7×7 window of the *target* (last) frame attend to

  (a) its own 49 tokens,
  (b) 132 fine-grained neighbours reached by the four diagonal ±expand_size
      circular rolls (reference ``:387-418``),
  (c) pooled windows of the target frame unfolded around each window
      (reference ``:423-468``),
  (d) pooled windows of each reference frame, coarser with temporal distance
      (``focal_l_clips=[1,2,3]``, kernels ``[7,5,3]``; reference ``:470-518``),

with four families of learned relative-position biases and additive −100.0
padding masks, softmax over the concatenated source axis, and a residual +
MLP applied to the last frame only (reference ``:809-826``).

TPU-first restructuring: every ``torch.roll`` / ``nn.Unfold`` / validity-mask
dance becomes a *static numpy gather index table* computed once per (H, W) at
trace time (shapes are static under jit). K/V assembly is then a handful of
gathers; the attention itself is one batched einsum over all windows — large,
dense, MXU-shaped work with no dynamic shapes. Padding masks are additive
−100.0 constants (matching the reference, not −inf), baked per-window.
"""

from __future__ import annotations

import dataclasses
import functools
import math
from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..ops.resize import resize_bilinear
from .mit import _dense_init, drop_path

__all__ = ["CFFMDecoderConfig", "CFFMDecoder", "build_geometry"]


@dataclasses.dataclass(frozen=True)
class CFFMDecoderConfig:
    dim: int = 256
    depth: int = 2
    num_heads: int = 8
    window_size: int = 7
    expand_size: int = 3
    focal_level: int = 2
    focal_window: int = 5
    focal_l_clips: tuple[int, ...] = (1, 2, 3)
    focal_kernel_clips: tuple[int, ...] = (7, 5, 3)
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    drop: float = 0.0
    attn_drop: float = 0.0
    drop_path: float = 0.0
    use_checkpoint: bool = False
    norm_eps: float = 1e-5  # torch nn.LayerNorm default
    # Inference K/V HBM layout for the fused CFM kernel: 'packed' (one XLA
    # concat feeding a single kernel ref) or 'grouped' (one ref per source
    # group, the training layout). Which wins is a whole-graph XLA
    # layout-assignment question — measured end-to-end per variant with
    # ``tools/bench_stage_block.py --e2e [--grouped-kv]``; per-variant
    # defaults are set in ``segmentor.build_model_config``.
    infer_kv_layout: str = "packed"


# ---------------------------------------------------------------------------
# Static geometry: gather indices + masks, computed in numpy per (H, W).
# ---------------------------------------------------------------------------


def _window_index(hp: int, wp: int, ws: int) -> np.ndarray:
    """(nW, ws*ws) flat indices into hp*wp selecting each window's pixels."""
    rows = np.arange(hp).reshape(hp // ws, ws)
    cols = np.arange(wp).reshape(wp // ws, ws)
    # windows ordered row-major over (nWh, nWw); pixels row-major within window
    r = rows[:, None, :, None]  # nWh, 1, ws, 1
    c = cols[None, :, None, :]  # 1, nWw, 1, ws
    idx = r * wp + c  # nWh, nWw, ws, ws
    return idx.reshape(-1, ws * ws)


def _rolled_index(hp: int, wp: int, ws: int, expand: int) -> np.ndarray:
    """(nW, n_valid) indices for the 4 diagonal circular rolls.

    ``torch.roll(t, shifts=(-e, -e))`` places ``t[(i+e) % H, (j+e) % W]`` at
    (i, j); window-partitioning the rolled maps and keeping
    ``valid_ind_rolled`` (reference ``:280-285, :387-418``) is equivalent to
    gathering these wrapped absolute positions.
    """
    shifts = [(-expand, -expand), (-expand, expand), (expand, -expand), (expand, expand)]
    masks = []
    e = expand
    for name in ("tl", "tr", "bl", "br"):
        m = np.ones((ws, ws), bool)
        if name == "tl":
            m[:-e, :-e] = False
        elif name == "tr":
            m[:-e, e:] = False
        elif name == "bl":
            m[e:, :-e] = False
        else:
            m[e:, e:] = False
        masks.append(m.reshape(-1))
    win = _window_index(hp, wp, ws)  # nW, ws*ws
    wr, wc = win // wp, win % wp
    per_roll = []
    for (sr, sc), m in zip(shifts, masks):
        # roll by (sr, sc) means output(i,j) = input((i - sr) % H, (j - sc) % W)
        rr = (wr - sr) % hp
        cc = (wc - sc) % wp
        per_roll.append((rr * wp + cc)[:, m])
    return np.concatenate(per_roll, axis=1)


def _unfold_index(map_h: int, map_w: int, kernel: int, stride: int, pad: int,
                  valid_keep: int = 0) -> tuple[np.ndarray, np.ndarray]:
    """Indices + additive mask replicating ``nn.Unfold`` output positions.

    Returns (positions, mask): positions (nOut, n_entries) flat indices into
    ``map_h*map_w`` (clamped where out of bounds), mask (nOut, n_entries)
    additive 0 / −100.0 for padded entries (reference ``:433-446``).
    ``valid_keep`` drops entries with di or dj < valid_keep (the
    ``valid_ind_unfold_k`` selection, reference ``:319-321``).
    """
    out_h = (map_h + 2 * pad - kernel) // stride + 1
    out_w = (map_w + 2 * pad - kernel) // stride + 1
    di = np.arange(kernel)
    dj = np.arange(kernel)
    if valid_keep > 0:
        keep = (di[:, None] >= valid_keep) & (dj[None, :] >= valid_keep)
    else:
        keep = np.ones((kernel, kernel), bool)
    oi = np.arange(out_h) * stride - pad
    oj = np.arange(out_w) * stride - pad
    # rows: (out_h, kernel); cols: (out_w, kernel)
    rows = oi[:, None] + di[None, :]
    cols = oj[:, None] + dj[None, :]
    rv = (rows >= 0) & (rows < map_h)
    cv = (cols >= 0) & (cols < map_w)
    rows_c = np.clip(rows, 0, map_h - 1)
    cols_c = np.clip(cols, 0, map_w - 1)
    # combine: (out_h, out_w, kernel, kernel)
    pos = rows_c[:, None, :, None] * map_w + cols_c[None, :, None, :]
    valid = rv[:, None, :, None] & cv[None, :, None, :]
    pos = pos.reshape(out_h * out_w, kernel * kernel)[:, keep.reshape(-1)]
    valid = valid.reshape(out_h * out_w, kernel * kernel)[:, keep.reshape(-1)]
    mask = np.where(valid, 0.0, -100.0).astype(np.float32)
    return pos, mask


def _relative_position_index(q_hw: tuple[int, int], k_hw: tuple[int, int]) -> np.ndarray:
    """Reference ``get_relative_position_index`` (``:158-185``)."""
    qh, qw = q_hw
    kh, kw = k_hw
    cq = np.stack(np.meshgrid(np.arange(qh), np.arange(qw), indexing="ij"), 0).reshape(2, -1)
    ck = np.stack(np.meshgrid(np.arange(kh), np.arange(kw), indexing="ij"), 0).reshape(2, -1)
    rel = cq[:, :, None] - ck[:, None, :]
    rel = rel.transpose(1, 2, 0)
    rel[:, :, 0] += kh - 1
    rel[:, :, 1] += kw - 1
    rel[:, :, 0] *= qw + kw - 1
    return rel.sum(-1)


@dataclasses.dataclass(frozen=True)
class _PooledLevel:
    """Geometry of one pooled K/V source (target focal level or clip level)."""

    pool_window: int          # sub-window size averaged by the learned fc pool
    pooled_hw: tuple[int, int]  # pooled map shape (nWh_k, nWw_k)
    resize_hw: tuple[int, int] | None  # pre-pool bilinear resize (clips only)
    trim_pad: tuple[int, int, int, int] | None  # (top, bottom, left, right); +pad / −trim
    unfold_idx: np.ndarray    # (nW, n_entries) gather into pooled map
    unfold_mask: np.ndarray   # (nW, n_entries) additive 0/−100
    bias_index: np.ndarray    # (49, n_entries) gather into the level's bias table
    bias_table_size: int
    kernel: int               # unfold kernel size
    stride: int               # unfold stride
    valid_keep: int = 0       # drop entries with di or dj < valid_keep


@dataclasses.dataclass(frozen=True)
class CFFMGeometry:
    h0: int
    w0: int
    hp: int
    wp: int
    n_wh: int
    n_ww: int
    win_idx: np.ndarray
    rolled_idx: np.ndarray
    win_bias_index: np.ndarray  # (49, 49) into (2w-1)^2 table
    target_levels: tuple[_PooledLevel, ...]
    clip_levels: tuple[_PooledLevel, ...]

    @property
    def num_windows(self) -> int:
        return self.n_wh * self.n_ww


@functools.lru_cache(maxsize=64)
def build_geometry(
    h0: int,
    w0: int,
    window_size: int = 7,
    expand_size: int = 3,
    focal_window: int = 5,
    focal_level: int = 2,
    focal_l_clips: tuple[int, ...] = (1, 2, 3),
    focal_kernel_clips: tuple[int, ...] = (7, 5, 3),
) -> CFFMGeometry:
    ws = window_size
    hp = math.ceil(h0 / ws) * ws
    wp = math.ceil(w0 / ws) * ws
    n_wh, n_ww = hp // ws, wp // ws

    win_idx = _window_index(hp, wp, ws)
    rolled_idx = _rolled_index(hp, wp, ws, expand_size)
    win_bias_index = _relative_position_index((ws, ws), (ws, ws))

    # pooled levels of the target frame (reference ``:739-776`` + ``:423-468``)
    target_levels = []
    for k in range(focal_level - 1):
        stride = 2**k
        pool_window = ws // stride  # floor(window_size / 2^k)
        ph, pw = n_wh * stride, n_ww * stride
        h_pool, w_pool = ph * pool_window, pw * pool_window
        # trim/pad the (hp, wp) map to (h_pool, w_pool), centred
        def _tp(cur, tgt):
            if cur > tgt:
                t = (cur - tgt) // 2
                return (-t, -(cur - tgt - t))
            if cur < tgt:
                p = (tgt - cur) // 2
                return (p, tgt - cur - p)
            return (0, 0)

        (tt, tb), (tl, tr) = _tp(hp, h_pool), _tp(wp, w_pool)
        trim_pad = None if (tt, tb, tl, tr) == (0, 0, 0, 0) else (tt, tb, tl, tr)
        kernel = 2 * (focal_window // 2) + 2**k + (2**k - 1)
        idx, mask = _unfold_index(ph, pw, kernel, stride, kernel // 2, valid_keep=(2**k - 1))
        kk = focal_window + 2**k - 1
        bias_index = _relative_position_index((ws, ws), (kk, kk))
        target_levels.append(
            _PooledLevel(
                pool_window=pool_window,
                pooled_hw=(ph, pw),
                resize_hw=None,
                trim_pad=trim_pad,
                unfold_idx=idx,
                unfold_mask=mask,
                bias_index=bias_index,
                bias_table_size=(ws + kk - 1) ** 2,
                kernel=kernel,
                stride=stride,
                valid_keep=2**k - 1,
            )
        )

    # pooled levels of the reference frames (reference ``:780-805`` + ``:470-518``)
    clip_levels = []
    for k, fl in enumerate(focal_l_clips):
        assert fl <= ws, "focal_l_clips > window_size path is dead in reference configs"
        pool_window = ws // fl
        ph, pw = n_wh * fl, n_ww * fl
        h_pool, w_pool = ph * pool_window, pw * pool_window
        resize_hw = None if (h_pool, w_pool) == (hp, wp) else (h_pool, w_pool)
        kernel = focal_kernel_clips[k]
        assert kernel % 2 == 1
        idx, mask = _unfold_index(ph, pw, kernel, fl, kernel // 2)
        bias_index = _relative_position_index((ws, ws), (kernel, kernel))
        clip_levels.append(
            _PooledLevel(
                pool_window=pool_window,
                pooled_hw=(ph, pw),
                resize_hw=resize_hw,
                trim_pad=None,
                unfold_idx=idx,
                unfold_mask=mask,
                bias_index=bias_index,
                bias_table_size=(ws + kernel - 1) ** 2,
                kernel=kernel,
                stride=fl,
            )
        )

    return CFFMGeometry(
        h0=h0,
        w0=w0,
        hp=hp,
        wp=wp,
        n_wh=n_wh,
        n_ww=n_ww,
        win_idx=win_idx,
        rolled_idx=rolled_idx,
        win_bias_index=win_bias_index,
        target_levels=tuple(target_levels),
        clip_levels=tuple(clip_levels),
    )


# ---------------------------------------------------------------------------
# Modules
# ---------------------------------------------------------------------------


def _gather_windows(flat: jnp.ndarray, idx: np.ndarray) -> jnp.ndarray:
    """flat (B, P, C), idx (nW, n) -> (B, nW, n, C)."""
    return flat[:, jnp.asarray(idx.reshape(-1))].reshape(flat.shape[0], *idx.shape, flat.shape[-1])


def _partition_windows(x: jnp.ndarray, ws: int) -> jnp.ndarray:
    """(B, Hp, Wp, C) -> (B, nW, ws*ws, C) via reshape/transpose (free on TPU
    relative to a general row gather)."""
    b, hp, wp, c = x.shape
    x = x.reshape(b, hp // ws, ws, wp // ws, ws, c)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(b, (hp // ws) * (wp // ws), ws * ws, c)


def _rolled_valid_subset(ws: int, expand: int) -> np.ndarray:
    """Constant indices into the concatenated 4×ws² rolled-window axis,
    matching the reference's ``valid_ind_rolled`` order (tl, tr, bl, br)."""
    e = expand
    out = []
    for r, name in enumerate(("tl", "tr", "bl", "br")):
        m = np.ones((ws, ws), bool)
        if name == "tl":
            m[:-e, :-e] = False
        elif name == "tr":
            m[:-e, e:] = False
        elif name == "bl":
            m[e:, :-e] = False
        else:
            m[e:, e:] = False
        out.append(r * ws * ws + np.nonzero(m.reshape(-1))[0])
    return np.concatenate(out)


@functools.lru_cache(maxsize=64)
def _unfold_onehot_np(map_h: int, map_w: int, kernel: int, stride: int,
                      pad: int, valid_keep: int) -> np.ndarray:
    """(nOut*n_entries, map_h*map_w) 0/1 selection matrix for the unfold.

    Row o*n_entries+e has a single 1 at the entry's source position, or an
    all-zero row where the entry falls in the zero padding (``nn.Unfold``
    pads with zeros — an all-zero row reproduces that exactly; those
    entries are additionally −100-masked in the attention)."""
    pos, mask = _unfold_index(map_h, map_w, kernel, stride, pad, valid_keep)
    n_out, n_ent = pos.shape
    oh = np.zeros((n_out * n_ent, map_h * map_w), np.float32)
    oh[np.arange(n_out * n_ent), pos.reshape(-1)] = (mask.reshape(-1) == 0.0)
    return oh


def _unfold_patches(x: jnp.ndarray, kernel: int, stride: int, pad: int,
                    valid_keep: int = 0) -> jnp.ndarray:
    """nn.Unfold ≙ im2col as a one-hot MXU matmul over the flat pooled map.

    x (B, H, W, C) -> (B, nOut, n_entries, C) with entries in (di, dj)
    row-major order, matching ``_unfold_index`` and the reference's
    ``nn.Unfold`` layout (``cffm_transformer.py:433-446``).

    Why a matmul: the pooled maps are tiny (≤27×27) while the unfolded
    output duplicates entries ~k²/stride²-fold. A constant 0/1 matrix times
    the flat map emits each output entry as an exact copy of its source
    (each row has at most a single 1 — no summation, bit-exact gather) and
    XLA lowers it as one clean dot. This replaced the round-2
    ``conv_general_dilated_patches`` + custom pad-sum VJP: the patch conv
    fusions were ~0.3 ms of the B=1 forward, and the dot's autodiff
    transpose is itself a single dot (the conv's transpose was a
    pathological C·k²-channel convolution)."""
    b, h, w, c = x.shape
    onehot = jnp.asarray(
        _unfold_onehot_np(h, w, kernel, stride, pad, valid_keep), x.dtype)
    out = jnp.einsum("mp,bpc->bmc", onehot, x.reshape(b, h * w, c))
    n_out = ((h + 2 * pad - kernel) // stride + 1) * (
        (w + 2 * pad - kernel) // stride + 1)
    return out.reshape(b, n_out, -1, c)


class _FcPool(nn.Module):
    """Learned window pooling: Dense(n_pix -> 1) over each sub-window's pixels,
    initialised to the mean (reference ``:674-689``).

    Computed as a *shared-weight depthwise* pw×pw stride-pw convolution: the
    learned pixel weights are broadcast over channels, which lowers to a
    native strided window reduction instead of the reshape/transpose/matmul
    dance (~4× faster on TPU for the 7×7 case).
    """

    pool_window: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:  # (B, Hq, Wq, C) -> (B, Hq/pw, Wq/pw, C)
        b, h, w, c = x.shape
        pw = self.pool_window
        n = pw * pw
        kernel = self.param("kernel", lambda *_: jnp.full((n, 1), 1.0 / n, jnp.float32), (n, 1))
        bias = self.param("bias", nn.initializers.zeros, (1,))
        x6 = x.astype(self.dtype).reshape(b, h // pw, pw, w // pw, pw, c)
        out = jnp.einsum(
            "bipjqc,pq->bijc", x6, kernel.astype(self.dtype).reshape(pw, pw)
        )
        return out + bias.astype(self.dtype)


class CFFMWindowAttention(nn.Module):
    """The CFM attention over concatenated K/V sources (reference ``:364-606``)."""

    cfg: CFFMDecoderConfig
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(
        self,
        x_target: jnp.ndarray,  # (B, Hp, Wp, C) normalised target frame
        pooled_target: Sequence[jnp.ndarray],  # per focal level (B, ph, pw, C)
        pooled_clips: Sequence[jnp.ndarray],  # per clip level (B, ph, pw, C)
        geom: CFFMGeometry,
        deterministic: bool = True,
    ) -> jnp.ndarray:  # (B, nW, ws*ws, C)
        cfg = self.cfg
        c = cfg.dim
        nh = cfg.num_heads
        hd = c // nh
        ws = cfg.window_size
        area = ws * ws
        scale = hd**-0.5
        b = x_target.shape[0]

        qkv_kernel = self.param("qkv_kernel", _dense_init, (c, 3 * c))
        qkv_bias = (
            self.param("qkv_bias", nn.initializers.zeros, (3 * c,)) if cfg.qkv_bias else None
        )

        def qkv(x, slice_=None):
            k = qkv_kernel if slice_ is None else qkv_kernel[:, c:]
            y = x.astype(self.dtype) @ k.astype(self.dtype)
            if qkv_bias is not None:
                bvec = qkv_bias if slice_ is None else qkv_bias[c:]
                y = y + bvec.astype(self.dtype)
            return y

        # --- target frame: q, k, v at full resolution -----------------------
        # All K/V assembly uses structured ops (reshape window partition,
        # jnp.roll, native patch extraction) instead of general row gathers —
        # the latter serialize badly on TPU and dominated decoder time.
        qkv_t = qkv(x_target)  # (B, Hp, Wp, 3C)
        q_map, k_map, v_map = jnp.split(qkv_t, 3, axis=-1)

        q_win = _partition_windows(q_map, ws)  # (B, nW, 49, C)
        valid_rolled = jnp.asarray(_rolled_valid_subset(ws, cfg.expand_size))

        def rolled(mp):
            # the four diagonal circular rolls of the reference (tl,tr,bl,br)
            e = cfg.expand_size
            rolls = [
                _partition_windows(jnp.roll(mp, (-e, -e), axis=(1, 2)), ws),
                _partition_windows(jnp.roll(mp, (-e, e), axis=(1, 2)), ws),
                _partition_windows(jnp.roll(mp, (e, -e), axis=(1, 2)), ws),
                _partition_windows(jnp.roll(mp, (e, e), axis=(1, 2)), ws),
            ]
            cat = jnp.concatenate(rolls, axis=2)  # (B, nW, 4*49, C)
            return cat[:, :, valid_rolled]

        k_parts = [_partition_windows(k_map, ws), rolled(k_map)]
        v_parts = [_partition_windows(v_map, ws), rolled(v_map)]
        mask_parts = [
            np.zeros(geom.win_idx.shape, np.float32),
            np.zeros(geom.rolled_idx.shape, np.float32),
        ]

        # --- pooled K/V sources ---------------------------------------------
        for pooled, level in list(zip(pooled_target, geom.target_levels)) + list(
            zip(pooled_clips, geom.clip_levels)
        ):
            kv_p = qkv(pooled, slice_="kv")  # (B, ph, pw, 2C)
            k_p, v_p = jnp.split(kv_p, 2, axis=-1)
            pad = level.kernel // 2 if level.stride <= ws else 0
            k_parts.append(_unfold_patches(k_p, level.kernel, level.stride, pad, level.valid_keep))
            v_parts.append(_unfold_patches(v_p, level.kernel, level.stride, pad, level.valid_keep))
            mask_parts.append(level.unfold_mask)

        n_src = sum(k.shape[2] for k in k_parts)

        # --- relative position biases ---------------------------------------
        bias_chunks = []
        table = self.param(
            "relative_position_bias_table", nn.initializers.zeros, ((2 * ws - 1) ** 2, nh)
        )
        # jnp.take (not table[idx]): params may arrive as numpy arrays, whose
        # fancy indexing cannot accept a traced index
        bias_chunks.append(
            jnp.take(table, jnp.asarray(geom.win_bias_index.reshape(-1)), axis=0)
            .reshape(area, area, nh).transpose(2, 0, 1)
        )
        n_rolled = geom.rolled_idx.shape[1]
        neighbor_bias = self.param(
            "relative_position_bias_to_neighbors", _dense_init, (nh, area, n_rolled)
        )
        bias_chunks.append(neighbor_bias)
        for i, level in enumerate(geom.target_levels):
            tbl = self.param(
                f"relative_position_bias_to_windows_{i}", _dense_init, (nh, level.bias_table_size)
            )
            bias_chunks.append(
                jnp.take(tbl, jnp.asarray(level.bias_index.reshape(-1)), axis=1)
                .reshape(nh, area, -1)
            )
        for i, level in enumerate(geom.clip_levels):
            tbl = self.param(
                f"relative_position_bias_to_windows_clips_{i}",
                _dense_init,
                (nh, level.bias_table_size),
            )
            bias_chunks.append(
                jnp.take(tbl, jnp.asarray(level.bias_index.reshape(-1)), axis=1)
                .reshape(nh, area, -1)
            )
        bias = jnp.concatenate(bias_chunks, axis=-1)  # (nH, 49, N)
        mask = jnp.asarray(np.concatenate(mask_parts, axis=1))  # (nW, N)

        # --- attention -------------------------------------------------------
        # Per-source-group scoring: K/V groups are never concatenated into
        # one (B, nW, N, C) tensor (which cost ~25% of decoder time as pure
        # HBM concatenate traffic); only the much smaller score tensor is
        # assembled for the softmax, and the output is a sum of per-group
        # attention matmuls. At inference this entire block (score concat +
        # bias/mask + f32 softmax + AV) runs as one fused Pallas kernel
        # (``ops/cfm_attention.py``); training keeps the differentiable XLA
        # formulation (identical math) for autodiff + attention dropout.
        n_w = geom.num_windows
        if cfg.attn_drop == 0.0:  # streaming softmax is differentiable; the
            # inline path below exists only for attention dropout
            from ..ops.cfm_attention import cfm_attention

            q_f = q_win.reshape(b * n_w, area, c)
            ks = [kp.reshape(b * n_w, kp.shape[2], c) for kp in k_parts]
            vs = [vp.reshape(b * n_w, vp.shape[2], c) for vp in v_parts]
            mask_t = jnp.tile(mask, (b, 1))
            out = cfm_attention(q_f, ks, vs, bias, mask_t, nh,
                                train=not deterministic,
                                kv_layout=cfg.infer_kv_layout)
            out = out.reshape(b, n_w, area, c)
        else:
            qh = q_win.reshape(b, -1, area, nh, hd).transpose(0, 1, 3, 2, 4)
            qs = qh * scale
            score_parts = []
            for kp in k_parts:
                khp = kp.reshape(b, -1, kp.shape[2], nh, hd).transpose(0, 1, 3, 2, 4)
                score_parts.append(jnp.einsum("bwhqd,bwhkd->bwhqk", qs, khp))
            attn = jnp.concatenate(score_parts, axis=-1)  # (B, nW, nh, 49, N)
            attn = attn + bias[None, None].astype(attn.dtype)
            attn = attn + mask[None, :, None, None, :].astype(attn.dtype)
            attn = jax.nn.softmax(attn.astype(jnp.float32), axis=-1).astype(self.dtype)
            if cfg.attn_drop > 0.0:
                attn = nn.Dropout(cfg.attn_drop)(attn, deterministic=deterministic)
            out = None
            offset = 0
            for vp in v_parts:
                n_g = vp.shape[2]
                vhp = vp.reshape(b, -1, n_g, nh, hd).transpose(0, 1, 3, 2, 4)
                contrib = jnp.einsum(
                    "bwhqk,bwhkd->bwhqd", attn[..., offset : offset + n_g], vhp
                )
                out = contrib if out is None else out + contrib
                offset += n_g
            out = out.transpose(0, 1, 3, 2, 4).reshape(b, -1, area, c)
        out = nn.Dense(c, kernel_init=_dense_init, dtype=self.dtype, name="proj")(out)
        if cfg.drop > 0.0:
            out = nn.Dropout(cfg.drop)(out, deterministic=deterministic)
        return out


class _Mlp(nn.Module):
    """Plain 2-layer MLP with exact GELU (reference cffm ``Mlp``, ``:10-26``)."""

    dim: int
    hidden: int
    drop: float = 0.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        x = nn.Dense(self.hidden, kernel_init=_dense_init, dtype=self.dtype, name="fc1")(x)
        x = nn.gelu(x, approximate=False)
        if self.drop > 0.0:
            x = nn.Dropout(self.drop)(x, deterministic=deterministic)
        x = nn.Dense(self.dim, kernel_init=_dense_init, dtype=self.dtype, name="fc2")(x)
        if self.drop > 0.0:
            x = nn.Dropout(self.drop)(x, deterministic=deterministic)
        return x


class CFFMBlock(nn.Module):
    """One CFFA+CFM block; updates only the last frame (reference ``:709-832``)."""

    cfg: CFFMDecoderConfig
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        cfg = self.cfg
        b, t, h0, w0, c = x.shape
        assert t == len(cfg.focal_l_clips) + 1, "clip length must be len(focal_l_clips)+1"
        geom = build_geometry(
            h0,
            w0,
            cfg.window_size,
            cfg.expand_size,
            cfg.focal_window,
            cfg.focal_level,
            tuple(cfg.focal_l_clips),
            tuple(cfg.focal_kernel_clips),
        )
        shortcut = x

        xn = nn.LayerNorm(epsilon=cfg.norm_eps, dtype=self.dtype, name="norm1")(x)
        pad_b, pad_r = geom.hp - h0, geom.wp - w0
        if pad_b or pad_r:
            xn = jnp.pad(xn, ((0, 0), (0, 0), (0, pad_b), (0, pad_r), (0, 0)))

        target = xn[:, -1]  # (B, Hp, Wp, C)

        pooled_target = []
        for k, level in enumerate(geom.target_levels):
            src = target
            if level.trim_pad is not None:
                # positive = pad, negative = centred trim (reference ``:749-766``)
                tt, tb, tl, tr = level.trim_pad
                src = src[:, max(-tt, 0) : src.shape[1] - max(-tb, 0)]
                src = src[:, :, max(-tl, 0) : src.shape[2] - max(-tr, 0)]
                src = jnp.pad(
                    src,
                    ((0, 0), (max(tt, 0), max(tb, 0)), (max(tl, 0), max(tr, 0)), (0, 0)),
                )
            pooled_target.append(
                _FcPool(level.pool_window, self.dtype, name=f"pool_layers_{k}")(src)
            )

        pooled_clips = []
        for k, level in enumerate(geom.clip_levels):
            src = xn[:, k]
            if level.resize_hw is not None:
                src = resize_bilinear(src, level.resize_hw, align_corners=False)
            pooled_clips.append(
                _FcPool(level.pool_window, self.dtype, name=f"pool_layers_clips_{k}")(src)
            )

        attn_windows = CFFMWindowAttention(cfg, self.dtype, name="attn")(
            target, pooled_target, pooled_clips, geom, deterministic
        )  # (B, nW, 49, C)

        # merge windows back to (B, Hp, Wp, C), crop padding
        ws = cfg.window_size
        out = attn_windows.reshape(b, geom.n_wh, geom.n_ww, ws, ws, c)
        out = out.transpose(0, 1, 3, 2, 4, 5).reshape(b, geom.hp, geom.wp, c)
        out = out[:, :h0, :w0]

        if not deterministic and cfg.drop_path > 0.0:
            out = drop_path(out, cfg.drop_path, deterministic, self.make_rng("droppath"))
        last = shortcut[:, -1] + out
        h = nn.LayerNorm(epsilon=cfg.norm_eps, dtype=self.dtype, name="norm2")(last)
        h = _Mlp(c, int(c * cfg.mlp_ratio), cfg.drop, self.dtype, name="mlp")(h, deterministic)
        if not deterministic and cfg.drop_path > 0.0:
            h = drop_path(h, cfg.drop_path, deterministic, self.make_rng("droppath"))
        last = last + h
        return jnp.concatenate([shortcut[:, :-1], last[:, None]], axis=1)


class CFFMDecoder(nn.Module):
    """Stack of ``depth`` CFFM blocks over a (B, T, H, W, C) clip."""

    cfg: CFFMDecoderConfig
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        block_cls = CFFMBlock
        if self.cfg.use_checkpoint:
            block_cls = nn.remat(CFFMBlock, static_argnums=(2,))
        for i in range(self.cfg.depth):
            x = block_cls(self.cfg, self.dtype, name=f"blocks_{i}")(x, deterministic)
        return x
