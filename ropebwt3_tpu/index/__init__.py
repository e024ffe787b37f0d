from .dense import DenseFMIndex  # noqa: F401
