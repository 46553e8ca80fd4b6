from . import hostmath  # noqa: F401
