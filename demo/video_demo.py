#!/usr/bin/env python
"""Clip inference demo (parity with reference ``demo/image_demo.py``).

    python demo/video_demo.py CONFIG CHECKPOINT frame1.jpg frame2.jpg \
        frame3.jpg frame4.jpg --out overlay.png
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import cv2

from vss_cffm_tpu.apis import inference_segmentor, init_segmentor, show_result


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("config")
    ap.add_argument("checkpoint")
    ap.add_argument("frames", nargs="+", help="clip frames, target last")
    ap.add_argument("--out", default="demo_out.png")
    args = ap.parse_args()

    bundle = init_segmentor(args.config, args.checkpoint)
    seg = inference_segmentor(bundle, args.frames)
    overlay = show_result(args.frames[-1], seg)
    cv2.imwrite(args.out, overlay)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
