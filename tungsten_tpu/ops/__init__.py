from . import covariance, means  # noqa: F401
