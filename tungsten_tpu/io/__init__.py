from .image import write_pfm, write_png  # noqa: F401
