from .native import get_native_gather, native_available  # noqa: F401
