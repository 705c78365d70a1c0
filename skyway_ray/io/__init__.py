from .registry import infer_format, READERS, WRITERS

__all__ = ["infer_format", "READERS", "WRITERS"]
