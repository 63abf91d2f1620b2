from .._core import BaseGeometry  # noqa: F401
