from .resize import resize_bilinear, resize_nearest, bilinear_weight_matrix

__all__ = ["resize_bilinear", "resize_nearest", "bilinear_weight_matrix"]
