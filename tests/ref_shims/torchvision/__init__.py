"""Minimal test shim for `torchvision` (not installed) so the reference
module imports; only the transforms the reference touches exist."""

from . import transforms  # noqa: F401
