from . import mmdb  # noqa: F401
