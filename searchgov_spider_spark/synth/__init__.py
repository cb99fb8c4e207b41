from . import webgen  # noqa: F401
