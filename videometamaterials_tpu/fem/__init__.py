from videometamaterials_tpu.fem.grf import (  # noqa: F401
    gaussian_random_field,
    generate_geometry,
)
