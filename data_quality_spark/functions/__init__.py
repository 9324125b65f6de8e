from . import audio, text

__all__ = ["audio", "text"]
