from .linear_support import LinearSupport

__all__ = ["LinearSupport"]
