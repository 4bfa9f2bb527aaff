from . import fec  # noqa: F401
