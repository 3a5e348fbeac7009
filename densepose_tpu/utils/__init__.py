from .registry import Registry, locate  # noqa: F401
