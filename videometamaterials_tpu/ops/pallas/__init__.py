from videometamaterials_tpu.ops.pallas.fused_linear_block import (  # noqa: F401
    fused_linear_block,
    reference_linear_block,
)
