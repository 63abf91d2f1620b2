# affinity — translate / rotate / scale with shapely's origin semantics.
import math

import numpy as np

from ._core import Point, LineString, Polygon, _MultiBase


def _apply(geom, fn):
    if isinstance(geom, Point):
        x, y = fn(np.array([[geom.x, geom.y]]))[0]
        return Point(float(x), float(y))
    if isinstance(geom, Polygon):
        return Polygon(fn(geom._c))
    if isinstance(geom, LineString):
        return LineString(fn(geom._c))
    if isinstance(geom, _MultiBase):
        out = type(geom)([_apply(g, fn) for g in geom.geoms])
        return out
    raise TypeError(type(geom))


def _origin_xy(geom, origin):
    if origin == "center":
        x0, y0, x1, y1 = geom.bounds
        return 0.5 * (x0 + x1), 0.5 * (y0 + y1)
    if origin == "centroid":
        c = geom.centroid
        return c.x, c.y
    if isinstance(origin, Point):
        return origin.x, origin.y
    return float(origin[0]), float(origin[1])


def translate(geom, xoff=0.0, yoff=0.0, zoff=0.0):
    return _apply(geom, lambda c: c + np.array([xoff, yoff]))


def rotate(geom, angle, origin="center", use_radians=False):
    th = float(angle) if use_radians else math.radians(float(angle))
    ox, oy = _origin_xy(geom, origin)
    R = np.array([[math.cos(th), -math.sin(th)],
                  [math.sin(th), math.cos(th)]])
    o = np.array([ox, oy])
    return _apply(geom, lambda c: (c - o) @ R.T + o)


def scale(geom, xfact=1.0, yfact=1.0, zfact=1.0, origin="center"):
    ox, oy = _origin_xy(geom, origin)
    o = np.array([ox, oy])
    f = np.array([xfact, yfact])
    return _apply(geom, lambda c: (c - o) * f + o)
