from .ruiz import ruiz_scale, scale_batch, MIN_SCALING, MAX_SCALING

__all__ = ["ruiz_scale", "scale_batch", "MIN_SCALING", "MAX_SCALING"]
