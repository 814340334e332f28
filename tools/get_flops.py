#!/usr/bin/env python
"""Analytic FLOPs/params for a CFFM config (parity surface with reference
``tools/get_flops.py`` which patches mmcv's counter with hand-derived SRA
attention FLOPs, ``:22-30``). Counts multiply-adds as 2 FLOPs.
"""

from __future__ import annotations

import argparse
import math
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from vss_cffm_tpu.config import apply_overrides, load_config


def mit_flops(cfg, h, w):
    total = 0
    ph, pw = h, w
    in_ch = 3
    for s in range(4):
        k, st = cfg.patch_sizes[s], cfg.patch_strides[s]
        ph, pw = ph // st, pw // st
        d = cfg.embed_dims[s]
        total += 2 * ph * pw * d * in_ch * k * k  # patch embed conv
        n = ph * pw
        sr = cfg.sr_ratios[s]
        n_kv = (ph // sr) * (pw // sr)
        for _ in range(cfg.depths[s]):
            total += 2 * n * d * d  # q
            if sr > 1:
                total += 2 * n_kv * d * d * sr * sr  # sr conv
            total += 2 * n_kv * d * 2 * d  # kv
            total += 2 * cfg.num_heads[s] * n * n_kv * (d // cfg.num_heads[s]) * 2  # qk + av
            total += 2 * n * d * d  # proj
            hidden = d * cfg.mlp_ratios[s]
            total += 2 * n * d * hidden * 2  # fc1 + fc2
            total += 2 * n * hidden * 9  # dwconv 3x3
        in_ch = d
    return total


def cffm_head_flops(head, h4, w4):
    e = head.embed_dim
    total = 0
    # linear_cX projections + fuse at 1/4
    strides = [1, 2, 4, 8]
    for cin, s in zip(head.in_channels, strides):
        total += 2 * (h4 // s) * (w4 // s) * cin * e
    total += 2 * h4 * w4 * 4 * e * e  # linear_fuse 1x1
    total += 2 * h4 * w4 * e * head.num_classes  # linear_pred
    # decoder at 1/8
    dec = head.decoder
    h8, w8 = h4 // 2, w4 // 2
    ws = dec.window_size
    hp = math.ceil(h8 / ws) * ws
    wp = math.ceil(w8 / ws) * ws
    n_w = (hp // ws) * (wp // ws)
    n_src = ws * ws + 132 + 25 + sum(k * k for k in dec.focal_kernel_clips)
    per_block = (
        2 * hp * wp * e * 3 * e  # qkv target
        + 2 * n_w * (25 + 49 + 25 + 9) * e * 2 * e  # pooled kv (approx)
        + 2 * dec.num_heads * n_w * ws * ws * n_src * (e // dec.num_heads) * 2
        + 2 * n_w * ws * ws * e * e  # proj
        + 2 * hp * wp * e * e * dec.mlp_ratio * 2  # mlp
    )
    total += dec.depth * per_block
    total += 2 * h4 * w4 * 2 * e * head.num_classes  # linear_pred2
    return total


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("config")
    ap.add_argument("--shape", type=int, nargs=2, default=[480, 480])
    ap.add_argument("--options", nargs="*", default=[])
    args = ap.parse_args()
    cfg = apply_overrides(load_config(args.config), args.options)
    h, w = args.shape
    t = len(cfg.data.dilation) + 1
    bb = mit_flops(cfg.model.backbone_config, h, w) * t
    head = cffm_head_flops(cfg.model.head, h // 4, w // 4)
    print(f"input: {t}x{h}x{w}")
    print(f"backbone: {bb / 1e9:.2f} GFLOPs")
    print(f"head:     {head / 1e9:.2f} GFLOPs")
    print(f"total:    {(bb + head) / 1e9:.2f} GFLOPs")


if __name__ == "__main__":
    main()
