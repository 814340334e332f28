"""CFFM++-B5 phase A: per-video prototype generation — mirrors
``local_configs/cffm/B5/cffm.b5.480x480.vspw2_gene_prototype.py``
(same trained model; k-means 100 centers x 10 iters over fused 1/8
features of 10 uniform frames per video of the train+val+test lists).
Run with ``tools/generate_prototypes.py <this> <cffm-b5-checkpoint>``."""

import dataclasses

from cffm_b5_vspw_160k import config as base_config
from vss_cffm_tpu.config import ProtoConfig


def config():
    return dataclasses.replace(
        base_config(),
        proto=ProtoConfig(n_clusters=100, num_frames=10, kmeans_iters=10),
        work_dir="work_dirs/cffm_b5_vspw_gene_prototype",
    )
