from . import udfs  # noqa: F401
