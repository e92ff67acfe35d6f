from . import weather_pipeline  # noqa: F401
