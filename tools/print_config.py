#!/usr/bin/env python
"""Print the fully-resolved experiment config (reference ``tools/print_config.py``)."""

import argparse
import dataclasses
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from vss_cffm_tpu.config import apply_overrides, load_config


def to_dict(cfg):
    if dataclasses.is_dataclass(cfg):
        return {f.name: to_dict(getattr(cfg, f.name)) for f in dataclasses.fields(cfg)}
    if isinstance(cfg, (list, tuple)):
        return [to_dict(v) for v in cfg]
    return cfg


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("config")
    ap.add_argument("--options", nargs="*", default=[])
    args = ap.parse_args()
    cfg = apply_overrides(load_config(args.config), args.options)
    print(json.dumps(to_dict(cfg), indent=2))


if __name__ == "__main__":
    main()
