from .base import BaseMetric, SimpleMetric
from .bglpips import BGLPIPS
from .clip_similarity import CLIPAccuracy, CLIPSimilarity
from .dino_vit_structure import DinoVitStructure
from .edit_metric import EditMetric
from .simple import LPIPSMetric, MSEMetric, PSNRMetric
from .nslpips import NSLPIPS
from .ssim import MSSSIM, SSIM, ms_ssim, ssim

__all__ = [
    "BaseMetric", "SimpleMetric", "EditMetric", "CLIPSimilarity", "CLIPAccuracy",
    "DinoVitStructure", "LPIPSMetric", "MSEMetric", "PSNRMetric", "NSLPIPS",
    "BGLPIPS", "SSIM", "MSSSIM", "ssim", "ms_ssim",
]
