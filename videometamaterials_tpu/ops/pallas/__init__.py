from videometamaterials_tpu.ops.pallas.fused_attention import (  # noqa: F401
    fused_small_attention,
)
