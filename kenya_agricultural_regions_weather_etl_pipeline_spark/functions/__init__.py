from . import weather, text, vectors  # noqa: F401
