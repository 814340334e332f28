"""CFFM decoder parity vs a functional torch implementation.

The torch side assembles K/V exactly the way the reference does — with
``torch.roll``, ``nn.Unfold`` and −100.0 padding masks (reference
``cffm_module/cffm_transformer.py:364-606, 709-832``) — but written as
straight-line functional code driven by the flax module's own parameters.
If our static-gather-index formulation diverges anywhere (roll wrapping,
unfold ordering, valid-index selection, bias indexing, mask placement), this
test catches it.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import torch
import torch.nn.functional as F

from vss_cffm_tpu.models.cffm_transformer import (
    CFFMBlock,
    CFFMDecoder,
    CFFMDecoderConfig,
    build_geometry,
)

CFG = CFFMDecoderConfig(dim=16, depth=1, num_heads=2, window_size=7, expand_size=3,
                        focal_level=2, focal_window=5,
                        focal_l_clips=(1, 2, 3), focal_kernel_clips=(7, 5, 3))


def t(x):
    return torch.from_numpy(np.array(x, dtype=np.float32))


def _ln(x, p, eps=1e-5):
    return F.layer_norm(x, (x.shape[-1],), t(p["scale"]), t(p["bias"]), eps)


def _window_partition(x, ws):
    b, h, w, c = x.shape
    x = x.view(b, h // ws, ws, w // ws, ws, c)
    return x.permute(0, 1, 3, 2, 4, 5).reshape(-1, ws, ws, c)


def _fc_pool(x, p, pw):
    """x (B,H,W,C) -> (B,H/pw,W/pw,C) with the learned Dense(pw*pw -> 1)."""
    b, h, w, c = x.shape
    xw = x.view(b, h // pw, pw, w // pw, pw, c).permute(0, 1, 3, 5, 2, 4)
    xw = xw.reshape(b, h // pw, w // pw, c, pw * pw)
    return (xw @ t(p["kernel"]))[..., 0] + t(p["bias"])


def _unfold_kv(kv_map, kernel, stride, pad, heads, valid_keep=0):
    """kv_map (B,C,ph,pw) -> (B, L, n_entries, C) in reference entry order."""
    b, c = kv_map.shape[:2]
    un = F.unfold(kv_map, kernel_size=kernel, stride=stride, padding=pad)
    L = un.shape[-1]
    un = un.view(b, c, kernel, kernel, L).permute(0, 4, 2, 3, 1)  # B,L,k,k,C
    un = un.reshape(b, L, kernel * kernel, c)
    if valid_keep:
        keep = torch.zeros(kernel, kernel, dtype=torch.bool)
        keep[valid_keep:, valid_keep:] = True
        un = un[:, :, keep.reshape(-1)]
    return un


def _unfold_mask(ph, pw, kernel, stride, pad, valid_keep=0):
    ones = torch.ones(1, 1, ph, pw)
    un = F.unfold(ones, kernel_size=kernel, stride=stride, padding=pad)
    L = un.shape[-1]
    un = un.view(1, 1, kernel, kernel, L).permute(0, 4, 2, 3, 1).reshape(L, kernel * kernel)
    if valid_keep:
        keep = torch.zeros(kernel, kernel, dtype=torch.bool)
        keep[valid_keep:, valid_keep:] = True
        un = un[:, keep.reshape(-1)]
    return torch.where(un == 0, torch.tensor(-100.0), torch.tensor(0.0))


def _rel_index(q_hw, k_hw):
    cq = torch.stack(torch.meshgrid(torch.arange(q_hw[0]), torch.arange(q_hw[1]), indexing="ij"))
    ck = torch.stack(torch.meshgrid(torch.arange(k_hw[0]), torch.arange(k_hw[1]), indexing="ij"))
    cq, ck = cq.flatten(1), ck.flatten(1)
    rel = (cq[:, :, None] - ck[:, None, :]).permute(1, 2, 0).contiguous()
    rel[:, :, 0] += k_hw[0] - 1
    rel[:, :, 1] += k_hw[1] - 1
    rel[:, :, 0] *= q_hw[1] + k_hw[1] - 1
    return rel.sum(-1)


def torch_cffm_block(x_np, params, cfg: CFFMDecoderConfig):
    """Reference-faithful functional forward of one CFFM block (torch, CPU)."""
    ws, e, fw = cfg.window_size, cfg.expand_size, cfg.focal_window
    c, nh = cfg.dim, cfg.num_heads
    hd = c // nh
    x = t(x_np)  # (B,T,H,W,C)
    b, T, h0, w0, _ = x.shape
    shortcut = x

    xn = _ln(x, params["norm1"])
    hp = (h0 + ws - 1) // ws * ws
    wp = (w0 + ws - 1) // ws * ws
    xn = F.pad(xn, (0, 0, 0, wp - w0, 0, hp - h0))
    n_wh, n_ww = hp // ws, wp // ws
    n_windows = n_wh * n_ww
    target = xn[:, -1]  # (B,Hp,Wp,C)

    qkv_w, qkv_b = t(params["attn"]["qkv_kernel"]), t(params["attn"]["qkv_bias"])
    area = ws * ws

    def qkv_all(inp):  # (...,C) -> q,k,v
        y = inp @ qkv_w + qkv_b
        return y[..., :c], y[..., c : 2 * c], y[..., 2 * c :]

    q_map, k_map, v_map = qkv_all(target)
    q_win = _window_partition(q_map, ws).reshape(-1, area, nh, hd).transpose(1, 2)
    k_win = _window_partition(k_map, ws).reshape(-1, area, nh, hd)
    v_win = _window_partition(v_map, ws).reshape(-1, area, nh, hd)

    # rolled K/V with validity selection
    rolls = [(-e, -e), (-e, e), (e, -e), (e, e)]
    masks = []
    for name in ("tl", "tr", "bl", "br"):
        m = torch.ones(ws, ws)
        if name == "tl":
            m[:-e, :-e] = 0
        elif name == "tr":
            m[:-e, e:] = 0
        elif name == "bl":
            m[e:, :-e] = 0
        else:
            m[e:, e:] = 0
        masks.append(m.flatten())
    valid_ind = torch.cat(masks).nonzero().view(-1)
    k_roll = torch.cat(
        [_window_partition(torch.roll(k_map, shifts=s, dims=(1, 2)), ws).reshape(-1, area, nh, hd) for s in rolls], 1
    )[:, valid_ind]
    v_roll = torch.cat(
        [_window_partition(torch.roll(v_map, shifts=s, dims=(1, 2)), ws).reshape(-1, area, nh, hd) for s in rolls], 1
    )[:, valid_ind]
    k_parts = [torch.cat([k_win, k_roll], 1)]
    v_parts = [torch.cat([v_win, v_roll], 1)]
    mask_parts = [torch.zeros(n_windows, k_parts[0].shape[1])]

    bias_parts = [
        t(params["attn"]["relative_position_bias_table"])[_rel_index((ws, ws), (ws, ws)).view(-1)]
        .view(area, area, nh)
        .permute(2, 0, 1),
        t(params["attn"]["relative_position_bias_to_neighbors"]),
    ]

    # pooled target levels
    for k in range(cfg.focal_level - 1):
        stride = 2**k
        pwd = ws // stride
        pooled = _fc_pool(target, params[f"pool_layers_{k}"], pwd)  # (B, nWh*s, nWw*s, C)
        _, kp, vp = qkv_all(pooled)
        kernel = 2 * (fw // 2) + 2**k + (2**k - 1)
        vk = 2**k - 1
        ph, pw_ = pooled.shape[1:3]
        k_parts.append(
            _unfold_kv(kp.permute(0, 3, 1, 2), kernel, stride, kernel // 2, nh, vk)
            .reshape(b * n_windows, -1, nh, hd)
        )
        v_parts.append(
            _unfold_kv(vp.permute(0, 3, 1, 2), kernel, stride, kernel // 2, nh, vk)
            .reshape(b * n_windows, -1, nh, hd)
        )
        mask_parts.append(_unfold_mask(ph, pw_, kernel, stride, kernel // 2, vk))
        kk = fw + 2**k - 1
        bias_parts.append(
            t(params["attn"][f"relative_position_bias_to_windows_{k}"])[:, _rel_index((ws, ws), (kk, kk)).view(-1)]
            .view(nh, area, kk * kk)
        )

    # pooled clip levels
    for k, fl in enumerate(cfg.focal_l_clips):
        pwd = ws // fl
        ph, pw_ = n_wh * fl, n_ww * fl
        hp_k, wp_k = ph * pwd, pw_ * pwd
        src = xn[:, k]
        if (hp_k, wp_k) != (hp, wp):
            src = F.interpolate(src.permute(0, 3, 1, 2), size=(hp_k, wp_k), mode="bilinear").permute(0, 2, 3, 1)
        pooled = _fc_pool(src, params[f"pool_layers_clips_{k}"], pwd)
        _, kp, vp = qkv_all(pooled)
        kernel = cfg.focal_kernel_clips[k]
        k_parts.append(
            _unfold_kv(kp.permute(0, 3, 1, 2), kernel, fl, kernel // 2, nh).reshape(b * n_windows, -1, nh, hd)
        )
        v_parts.append(
            _unfold_kv(vp.permute(0, 3, 1, 2), kernel, fl, kernel // 2, nh).reshape(b * n_windows, -1, nh, hd)
        )
        mask_parts.append(_unfold_mask(ph, pw_, kernel, fl, kernel // 2))
        bias_parts.append(
            t(params["attn"][f"relative_position_bias_to_windows_clips_{k}"])[
                :, _rel_index((ws, ws), (kernel, kernel)).view(-1)
            ].view(nh, area, kernel * kernel)
        )

    k_all = torch.cat(k_parts, 1).transpose(1, 2)  # (B*nW, nh, N, hd)
    v_all = torch.cat(v_parts, 1).transpose(1, 2)
    mask = torch.cat(mask_parts, 1)  # (nW, N)
    bias = torch.cat(bias_parts, -1)  # (nh, 49, N)

    attn = (q_win * hd**-0.5) @ k_all.transpose(-2, -1)  # (B*nW, nh, 49, N)
    attn = attn + bias.unsqueeze(0)
    attn = attn + mask.repeat(b, 1)[:, None, None, :]
    attn = attn.softmax(-1)
    out = (attn @ v_all).transpose(1, 2).reshape(-1, area, c)
    out = out @ t(params["attn"]["proj"]["kernel"]) + t(params["attn"]["proj"]["bias"])

    # window reverse + crop + residual on last frame + MLP
    out = out.view(b, n_wh, n_ww, ws, ws, c).permute(0, 1, 3, 2, 4, 5).reshape(b, hp, wp, c)
    out = out[:, :h0, :w0]
    last = shortcut[:, -1] + out
    h2 = _ln(last, params["norm2"])
    mlp = params["mlp"]
    h2 = F.gelu(h2 @ t(mlp["fc1"]["kernel"]) + t(mlp["fc1"]["bias"]))
    h2 = h2 @ t(mlp["fc2"]["kernel"]) + t(mlp["fc2"]["bias"])
    last = last + h2
    return torch.cat([shortcut[:, :-1], last.unsqueeze(1)], 1).numpy()


@pytest.mark.parametrize("hw", [(14, 14), (9, 11)])
def test_block_matches_torch_reference_semantics(rng, hw):
    h, w = hw
    x = rng.randn(1, 4, h, w, CFG.dim).astype(np.float32) * 0.5
    mod = CFFMBlock(CFG)
    params = mod.init(jax.random.PRNGKey(0), jnp.asarray(x))["params"]
    got = np.asarray(mod.apply({"params": params}, jnp.asarray(x)))
    want = torch_cffm_block(x, jax.tree.map(np.asarray, params), CFG)
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_only_last_frame_updated(rng):
    x = rng.randn(1, 4, 14, 14, CFG.dim).astype(np.float32)
    mod = CFFMDecoder(CFG)
    params = mod.init(jax.random.PRNGKey(0), jnp.asarray(x))["params"]
    out = np.asarray(mod.apply({"params": params}, jnp.asarray(x)))
    np.testing.assert_array_equal(out[:, :-1], x[:, :-1])
    assert np.abs(out[:, -1] - x[:, -1]).max() > 0


def test_geometry_source_counts():
    g = build_geometry(60, 108)
    # window 49 + rolled 132 + pooled-target 25 + clips (49 + 25 + 9)
    assert g.win_idx.shape == (9 * 16, 49)
    assert g.rolled_idx.shape == (9 * 16, 132)
    assert g.target_levels[0].unfold_idx.shape == (9 * 16, 25)
    assert [lv.unfold_idx.shape[1] for lv in g.clip_levels] == [49, 25, 9]


def test_decoder_depth_stacks(rng):
    cfg = CFFMDecoderConfig(dim=16, depth=2, num_heads=2)
    x = rng.randn(1, 4, 14, 14, 16).astype(np.float32)
    mod = CFFMDecoder(cfg)
    params = mod.init(jax.random.PRNGKey(0), jnp.asarray(x))["params"]
    out = mod.apply({"params": params}, jnp.asarray(x))
    assert out.shape == x.shape
