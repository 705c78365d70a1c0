from .flagship import flagship_pipeline, FLAGSHIP_FILTER

__all__ = ["flagship_pipeline", "FLAGSHIP_FILTER"]
