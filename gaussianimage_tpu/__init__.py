"""gaussianimage_tpu — a TPU-native (JAX/XLA/Pallas) 2D Gaussian-splatting image
representation and compression framework.

Re-designed from scratch for TPU with the capabilities of the GaussianImage
reference (ECCV 2024, arXiv 2403.08551; reference repo surveyed in SURVEY.md):

- ``core``     pure-jnp Gaussian math and a dense oracle renderer
- ``ops``      Pallas tile rasterization kernels (accumulated-sum + sorted blend)
- ``models``   GaussianImage model variants (Cholesky, RS, masked, 3DGS baseline)
- ``opt``      Adan optimizer (optax transform) + LR schedules
- ``codec``    quantization-aware-training toolkit + rANS entropy coding
- ``parallel`` device-mesh sharding (data / gaussian / tile parallel)
- ``utils``    losses, metrics (PSNR / SSIM / MS-SSIM), logging, image IO
"""

__version__ = "0.1.0"
