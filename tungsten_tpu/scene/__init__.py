from .parse import load_scene  # noqa: F401
