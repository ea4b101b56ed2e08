from . import segmentation  # noqa: F401
