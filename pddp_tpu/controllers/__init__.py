"""Controllers."""

__all__ = []
