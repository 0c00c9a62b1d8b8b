from videometamaterials_tpu.ops.schedules import (  # noqa: F401
    DiffusionSchedule,
    cosine_beta_schedule,
    make_schedule,
)
from videometamaterials_tpu.ops.rotary import rotary_frequencies, apply_rotary  # noqa: F401
from videometamaterials_tpu.ops.relative_bias import relative_position_bucket  # noqa: F401
