from videometamaterials_tpu.models.unet3d import UNet3D  # noqa: F401
from videometamaterials_tpu.models.embeddings import (  # noqa: F401
    SinusoidalPosEmb,
    RelativePositionBias,
    SignalEmbedding,
)
