from gaussianimage_tpu.utils.losses import loss_fn
from gaussianimage_tpu.utils.metrics import psnr, ssim, ms_ssim
from gaussianimage_tpu.utils.logwriter import LogWriter

__all__ = ["loss_fn", "psnr", "ssim", "ms_ssim", "LogWriter"]
