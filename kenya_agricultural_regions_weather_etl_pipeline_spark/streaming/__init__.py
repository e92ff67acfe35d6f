from . import micro_batch  # noqa: F401
