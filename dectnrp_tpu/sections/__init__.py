from . import part3  # noqa: F401
