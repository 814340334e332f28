from .cffm_transformer import CFFMDecoder, CFFMDecoderConfig
from .cluster_head import ClusterDecoder
from .heads import CFFMHead, CFFMHeadConfig, SegFormerHead
from .mit import MIT_VARIANTS, MiT, MiTConfig
from .segmentor import CFFMSegmentor, ImageSegmentor, SegmentorConfig, build_model_config

__all__ = [
    "CFFMDecoder",
    "CFFMDecoderConfig",
    "ClusterDecoder",
    "CFFMHead",
    "CFFMHeadConfig",
    "SegFormerHead",
    "MIT_VARIANTS",
    "MiT",
    "MiTConfig",
    "CFFMSegmentor",
    "ImageSegmentor",
    "SegmentorConfig",
    "build_model_config",
]
