from .tables import CheckpointStore  # noqa: F401
