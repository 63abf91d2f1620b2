# shapely shim — numpy stand-in for the shapely subset used by the
# reference multigraph pipeline.  Built to MEASURE the reference baseline
# on this host (real shapely is unavailable); see tools/measure_mg_baseline.py.
from ._core import (  # noqa: F401
    BaseGeometry, Point, LineString, Polygon,
    MultiPoint, MultiLineString, MultiPolygon, GeometryCollection)

__version__ = "0.0-shim"
