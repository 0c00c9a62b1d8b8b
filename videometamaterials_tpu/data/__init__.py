from videometamaterials_tpu.data.normalization import Normalization  # noqa: F401
