from videometamaterials_tpu.ops.pallas.fused_block import (  # noqa: F401
    fused_temporal_block,
)
