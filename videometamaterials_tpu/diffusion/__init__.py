from videometamaterials_tpu.diffusion.gaussian import GaussianDiffusion  # noqa: F401
