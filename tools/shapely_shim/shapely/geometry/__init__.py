from .._core import (  # noqa: F401
    Point, LineString, Polygon, MultiPoint, MultiLineString, MultiPolygon,
    GeometryCollection)
from .._core import _Ring as LinearRing  # noqa: F401
