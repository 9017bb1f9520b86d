from gaussianimage_tpu.opt.adan import adan, scale_by_adan
from gaussianimage_tpu.opt.schedules import step_lr

__all__ = ["adan", "scale_by_adan", "step_lr"]
