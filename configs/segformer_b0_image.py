"""Single-frame SegFormer-B0 (image model zoo surface — the per-frame half
of CFFM, reference ``segformer_head.py`` + image ``EncoderDecoder``)."""

import dataclasses

from vss_cffm_tpu.config import DataConfig, ExperimentConfig
from vss_cffm_tpu.models.segmentor import build_model_config


def config() -> ExperimentConfig:
    return ExperimentConfig(
        model=dataclasses.replace(
            build_model_config("b0", num_classes=124, num_clips=1), arch="image"
        ),
        data=DataConfig(dilation=(), batch_size=16),
        work_dir="work_dirs/segformer_b0_image",
    )
