"""videometamaterials_tpu — TPU-native framework for inverse design of nonlinear
mechanical metamaterials via video denoising diffusion models.

A from-scratch JAX/XLA/Pallas re-design with the capabilities of
jhbastek/VideoMetamaterials (reference layout: /root/reference/main.py,
denoising_diffusion_pytorch/video_denoising_diffusion_pytorch.py).

Layers (see SURVEY.md §1):
  L1 data       -> videometamaterials_tpu.data
  L2 model      -> videometamaterials_tpu.models (UNet3D, embeddings)
  L3 diffusion  -> videometamaterials_tpu.diffusion (GaussianDiffusion)
  L4 trainer    -> videometamaterials_tpu.training (Trainer, checkpointing)
  L0 comm       -> videometamaterials_tpu.parallel (mesh/sharding over ICI)
  side stacks   -> videometamaterials_tpu.postproc (geometry/metrics/visualization)
                   videometamaterials_tpu.fem (Abaqus wrapper + GRF sampling)
"""

__version__ = "0.1.0"

from videometamaterials_tpu.config import (  # noqa: F401
    ModelConfig,
    TrainerConfig,
    load_model_yaml,
    save_model_yaml,
)
