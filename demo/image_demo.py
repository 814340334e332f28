#!/usr/bin/env python
"""Single-image inference demo (parity with reference ``demo/image_demo.py``).

    python demo/image_demo.py IMG CONFIG CHECKPOINT --out overlay.png \
        --palette cityscapes

Uses the single-frame path of ``inference_segmentor`` (an image config such
as ``configs/segformer_b0_image.py``, or a clip config — the image is then
repeated as a static clip, matching how the reference's image demo would be
pointed at a video model).
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import cv2

from vss_cffm_tpu.apis import inference_segmentor, init_segmentor, show_result
from vss_cffm_tpu.data import get_palette


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("img", help="image file")
    ap.add_argument("config", help="config file")
    ap.add_argument("checkpoint", help="orbax checkpoint dir or converted .pth")
    ap.add_argument("--out", default="demo_out.png")
    ap.add_argument("--palette", default="vspw", help="vspw | cityscapes")
    ap.add_argument("--opacity", type=float, default=0.5)
    args = ap.parse_args()

    bundle = init_segmentor(args.config, args.checkpoint)
    if bundle.cfg.model.arch == "image":
        imgs = args.img
    else:  # clip model: repeat the still image as a static clip
        t = len(bundle.cfg.data.dilation) + 1
        imgs = [args.img] * t
    seg = inference_segmentor(bundle, imgs)
    overlay = show_result(args.img, seg, palette=get_palette(args.palette),
                          opacity=args.opacity)
    cv2.imwrite(args.out, overlay)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
