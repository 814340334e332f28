"""CFFM-B0 @ VSPW (decoder depth 1) — mirrors ``local_configs/cffm/B0``."""

import dataclasses

from cffm_b1_vspw_160k import config as b1_config
from vss_cffm_tpu.models.segmentor import build_model_config


def config():
    base = b1_config()
    return dataclasses.replace(
        base,
        model=build_model_config("b0", num_classes=124, num_clips=4),
        work_dir="work_dirs/cffm_b0_vspw_160k",
    )
