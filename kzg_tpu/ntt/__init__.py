from .domain import Domain

__all__ = ["Domain"]
