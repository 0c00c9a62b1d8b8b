from videometamaterials_tpu.postproc.geometry import clean_pred  # noqa: F401
from videometamaterials_tpu.postproc.metrics import (  # noqa: F401
    compute_NRMSE,
    compute_NRMSE_arrays,
    compute_full_error,
    find_closest_match,
)
