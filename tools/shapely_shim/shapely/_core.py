# _core.py — minimal pure-numpy implementation of the shapely API subset
# the reference multigraph pipeline uses (multi_combinator.py:13-25,
# single_variants.py:17-19, generator.py:26).
#
# Purpose: measure the reference baseline on this host (shapely is not
# installable here).  This is OUR implementation of the public shapely
# API — geometry math from first principles, not shapely source.
#
# Scope: convex polygon booleans (Sutherland–Hodgman clip), exact
# area/centroid/bounds/distance/predicates for polygons, points and
# linestrings.  unary_union returns a MultiPolygon wrapper whose area is
# the sum of member areas (exact for the disjoint/adjacent arrangements
# it is called on here).  Non-convex difference is NOT implemented (only
# reached by the reference's single-shape 'random' mode masks, which the
# committed CLI never runs).
from __future__ import annotations

import math

import numpy as np

_EPS = 1e-12


def _as_coords(obj):
    a = np.asarray(obj, dtype=np.float64)
    if a.ndim != 2 or a.shape[1] < 2:
        raise ValueError(f"bad coordinate array shape {a.shape}")
    return a[:, :2]


def _ring_area(c):
    x, y = c[:, 0], c[:, 1]
    return 0.5 * float(np.sum(x * np.roll(y, -1) - np.roll(x, -1) * y))


def _seg_point_dist(p, a, b):
    """Distances from points p[N,2] to segments (a[M,2], b[M,2]): [N, M]."""
    ab = b - a                                          # [M,2]
    ap = p[:, None, :] - a[None, :, :]                  # [N,M,2]
    denom = np.maximum(np.einsum("md,md->m", ab, ab), _EPS)
    t = np.clip(np.einsum("nmd,md->nm", ap, ab) / denom, 0.0, 1.0)
    proj = a[None, :, :] + t[:, :, None] * ab[None, :, :]
    return np.linalg.norm(p[:, None, :] - proj, axis=-1)


def _seg_seg_dist(a0, a1, b0, b1):
    """Min distance between segment sets A [M] and B [K] (no overlap test)."""
    d1 = _seg_point_dist(a0, b0, b1).min() if len(a0) else math.inf
    d2 = _seg_point_dist(a1, b0, b1).min() if len(a1) else math.inf
    d3 = _seg_point_dist(b0, a0, a1).min() if len(b0) else math.inf
    d4 = _seg_point_dist(b1, a0, a1).min() if len(b1) else math.inf
    return min(d1, d2, d3, d4)


def _segments(c, closed):
    if closed:
        return c, np.roll(c, -1, axis=0)
    return c[:-1], c[1:]


def _point_in_ring(pts, ring):
    """Crossing-number point-in-polygon for pts [N,2] vs ring [M,2]."""
    x, y = pts[:, 0][:, None], pts[:, 1][:, None]
    x0, y0 = ring[:, 0][None, :], ring[:, 1][None, :]
    x1, y1 = np.roll(ring[:, 0], -1)[None, :], np.roll(ring[:, 1], -1)[None, :]
    cond = (y0 <= y) != (y1 <= y)
    denom = np.where(np.abs(y1 - y0) < _EPS, _EPS, y1 - y0)
    xs = x0 + (y - y0) * (x1 - x0) / denom
    return (np.sum(cond & (x < xs), axis=1) % 2).astype(bool)


def _segs_intersect(a0, a1, b0, b1):
    """Any proper/touching intersection between segment sets A and B."""
    d = lambda p, q, r: ((q[..., 0] - p[..., 0]) * (r[..., 1] - p[..., 1])
                         - (q[..., 1] - p[..., 1]) * (r[..., 0] - p[..., 0]))
    A0 = a0[:, None, :]
    A1 = a1[:, None, :]
    B0 = b0[None, :, :]
    B1 = b1[None, :, :]
    d1 = d(A0, A1, B0)
    d2 = d(A0, A1, B1)
    d3 = d(B0, B1, A0)
    d4 = d(B0, B1, A1)
    return bool(np.any((d1 * d2 <= _EPS) & (d3 * d4 <= _EPS)))


def _convex_clip(subject, clip):
    """Sutherland–Hodgman: subject ring clipped by CCW convex ring."""
    out = list(subject)
    m = len(clip)
    for i in range(m):
        a, b = clip[i], clip[(i + 1) % m]
        if not out:
            break
        inp, out = out, []
        ex, ey = b[0] - a[0], b[1] - a[1]

        # inside = left of edge for a CCW clip ring
        def inside(p):
            return ex * (p[1] - a[1]) - ey * (p[0] - a[0]) >= -1e-9

        s = inp[-1]
        s_in = inside(s)
        for p in inp:
            p_in = inside(p)
            if p_in != s_in:
                # segment crosses the clip line: add intersection
                dx, dy = p[0] - s[0], p[1] - s[1]
                denom = ex * dy - ey * dx
                if abs(denom) > _EPS:
                    t = (ex * (a[1] - s[1]) - ey * (a[0] - s[0])) / denom
                    out.append((s[0] + t * dx, s[1] + t * dy))
            if p_in:
                out.append(tuple(p))
            s, s_in = p, p_in
    return np.asarray(out, dtype=np.float64) if out else np.zeros((0, 2))


class BaseGeometry:
    geom_type = "GeometryCollection"
    is_valid = True

    @property
    def is_empty(self):
        return False

    def buffer(self, dist, resolution=16, **kw):
        if abs(dist) < _EPS:
            return self
        raise NotImplementedError("shim: buffer on %s" % type(self).__name__)

    def equals(self, other):
        return self.bounds == other.bounds and abs(
            getattr(self, "area", 0.0) - getattr(other, "area", 0.0)) < 1e-9


class Point(BaseGeometry):
    geom_type = "Point"

    def __init__(self, *args):
        if len(args) == 1:
            args = tuple(np.asarray(args[0], dtype=np.float64).reshape(-1))
        self.x, self.y = float(args[0]), float(args[1])

    @property
    def coords(self):
        return [(self.x, self.y)]

    @property
    def xy(self):
        return (np.array([self.x]), np.array([self.y]))

    @property
    def bounds(self):
        return (self.x, self.y, self.x, self.y)

    @property
    def area(self):
        return 0.0

    @property
    def centroid(self):
        return self

    def buffer(self, dist, resolution=16, **kw):
        # shapely semantics: `resolution` segments per quarter circle,
        # first vertex at angle 0
        n = max(4 * int(resolution), 8)
        th = np.linspace(0.0, 2.0 * math.pi, n, endpoint=False)
        c = np.stack([self.x + dist * np.cos(th),
                      self.y + dist * np.sin(th)], axis=1)
        return Polygon(c)

    def distance(self, other):
        return other._dist_to_points(np.array([[self.x, self.y]]))

    def _dist_to_points(self, pts):
        return float(np.min(np.linalg.norm(
            pts - np.array([self.x, self.y]), axis=1)))

    def representative_point(self):
        return self


class LineString(BaseGeometry):
    geom_type = "LineString"

    def __init__(self, coords):
        if coords is None or len(coords) == 0:
            self._c = np.zeros((0, 2))
        else:
            self._c = _as_coords([(p.x, p.y) if isinstance(p, Point) else p
                                  for p in coords])

    @property
    def is_empty(self):
        return len(self._c) == 0

    @property
    def coords(self):
        return [tuple(p) for p in self._c]

    @property
    def xy(self):
        return (self._c[:, 0].copy(), self._c[:, 1].copy())

    @property
    def bounds(self):
        c = self._c
        return (float(c[:, 0].min()), float(c[:, 1].min()),
                float(c[:, 0].max()), float(c[:, 1].max()))

    @property
    def length(self):
        return float(np.sum(np.linalg.norm(np.diff(self._c, axis=0), axis=1)))

    @property
    def area(self):
        return 0.0

    @property
    def centroid(self):
        seg = np.diff(self._c, axis=0)
        ln = np.linalg.norm(seg, axis=1)
        if ln.sum() < _EPS:
            return Point(self._c[0])
        mid = 0.5 * (self._c[:-1] + self._c[1:])
        w = ln / ln.sum()
        return Point(float(np.dot(w, mid[:, 0])), float(np.dot(w, mid[:, 1])))

    @property
    def boundary(self):
        return MultiPoint([Point(self._c[0]), Point(self._c[-1])])

    def _segs(self):
        return _segments(self._c, closed=False)

    def _dist_to_points(self, pts):
        a, b = self._segs()
        return float(_seg_point_dist(pts, a, b).min())

    def distance(self, other):
        return _generic_distance(self, other)

    def intersects(self, other):
        return _generic_intersects(self, other)

    def project(self, other, normalized=False):
        """Arc-length position along the line of `other`'s projection."""
        p = np.array([other.x, other.y])
        a, b = self._segs()
        ab = b - a
        denom = np.maximum(np.einsum("md,md->m", ab, ab), _EPS)
        t = np.clip(np.einsum("md,md->m", p[None, :] - a, ab) / denom,
                    0.0, 1.0)
        proj = a + t[:, None] * ab
        d = np.linalg.norm(proj - p[None, :], axis=1)
        i = int(np.argmin(d))
        ln = np.linalg.norm(ab, axis=1)
        dist = float(ln[:i].sum() + t[i] * ln[i])
        if normalized:
            return dist / max(float(ln.sum()), _EPS)
        return dist

    def interpolate(self, t, normalized=False):
        seg = np.diff(self._c, axis=0)
        ln = np.linalg.norm(seg, axis=1)
        total = float(ln.sum())
        d = float(t) * total if normalized else float(t)
        d = min(max(d, 0.0), total)
        cum = np.concatenate([[0.0], np.cumsum(ln)])
        i = int(np.searchsorted(cum, d, side="right") - 1)
        i = min(i, len(seg) - 1)
        f = (d - cum[i]) / max(ln[i], _EPS)
        p = self._c[i] + f * seg[i]
        return Point(p)


class _Ring(LineString):
    """Polygon exterior: closed coordinate sequence."""

    def __init__(self, coords):
        c = _as_coords(coords)
        if np.linalg.norm(c[0] - c[-1]) > _EPS:
            c = np.vstack([c, c[:1]])
        self._c = c


class Polygon(BaseGeometry):
    geom_type = "Polygon"

    def __init__(self, shell=None, holes=None):
        if shell is None or (hasattr(shell, "__len__") and len(shell) == 0):
            self._c = np.zeros((0, 2))
        else:
            c = _as_coords([(p.x, p.y) if isinstance(p, Point) else p
                            for p in shell])
            if len(c) >= 2 and np.linalg.norm(c[0] - c[-1]) < _EPS:
                c = c[:-1]
            # normalize to CCW so convex clipping is orientation-safe
            if len(c) >= 3 and _ring_area(c) < 0:
                c = c[::-1]
            self._c = c
        # holes are ignored (never produced by the shim's own ops and the
        # reference only constructs shells)

    @property
    def is_empty(self):
        return len(self._c) < 3

    @property
    def exterior(self):
        return _Ring(self._c) if len(self._c) else LineString([])

    @property
    def boundary(self):
        return self.exterior

    @property
    def coords(self):
        return self.exterior.coords

    @property
    def bounds(self):
        if self.is_empty:
            return (0.0, 0.0, 0.0, 0.0)
        c = self._c
        return (float(c[:, 0].min()), float(c[:, 1].min()),
                float(c[:, 0].max()), float(c[:, 1].max()))

    @property
    def area(self):
        if self.is_empty:
            return 0.0
        return abs(_ring_area(self._c))

    @property
    def length(self):
        if self.is_empty:
            return 0.0
        a, b = _segments(self._c, closed=True)
        return float(np.sum(np.linalg.norm(b - a, axis=1)))

    @property
    def centroid(self):
        if self.is_empty:
            return Point(0.0, 0.0)
        c = self._c
        x, y = c[:, 0], c[:, 1]
        xn, yn = np.roll(x, -1), np.roll(y, -1)
        cross = x * yn - xn * y
        a = 0.5 * cross.sum()
        if abs(a) < _EPS:
            return Point(float(x.mean()), float(y.mean()))
        cx = float(np.sum((x + xn) * cross) / (6.0 * a))
        cy = float(np.sum((y + yn) * cross) / (6.0 * a))
        return Point(cx, cy)

    @property
    def convex_hull(self):
        if self.is_empty:
            return self
        pts = self._c[np.lexsort((self._c[:, 1], self._c[:, 0]))]

        def half(p):
            out = []
            for q in p:
                while len(out) >= 2 and np.cross(out[-1] - out[-2],
                                                 q - out[-2]) <= 0:
                    out.pop()
                out.append(q)
            return out

        hull = half(pts)[:-1] + half(pts[::-1])[:-1]
        return Polygon(np.asarray(hull))

    def simplify(self, tol, preserve_topology=True):
        return self

    def buffer(self, dist, resolution=16, **kw):
        if abs(dist) < _EPS:
            return self
        # vertex-normal offset (adequate for the QC/feature call sites)
        c = self._c
        prev = np.roll(c, 1, axis=0)
        nxt = np.roll(c, -1, axis=0)
        e0 = c - prev
        e1 = nxt - c
        n0 = np.stack([e0[:, 1], -e0[:, 0]], axis=1)
        n1 = np.stack([e1[:, 1], -e1[:, 0]], axis=1)
        n0 /= np.maximum(np.linalg.norm(n0, axis=1, keepdims=True), _EPS)
        n1 /= np.maximum(np.linalg.norm(n1, axis=1, keepdims=True), _EPS)
        n = n0 + n1
        n /= np.maximum(np.linalg.norm(n, axis=1, keepdims=True), _EPS)
        # CCW ring: outward normal is (dy, -dx) flipped -> use -n for grow
        return Polygon(c - n * dist)

    def _segs(self):
        return _segments(self._c, closed=True)

    def _contains_points(self, pts):
        return _point_in_ring(pts, self._c)

    def contains(self, other):
        if isinstance(other, Point):
            return bool(self._contains_points(
                np.array([[other.x, other.y]]))[0])
        if isinstance(other, Polygon):
            return (bool(np.all(self._contains_points(other._c)))
                    and not self._boundaries_cross(other))
        if isinstance(other, LineString):
            return bool(np.all(self._contains_points(other._c)))
        return False

    def within(self, other):
        return other.contains(self)

    def _boundaries_cross(self, other):
        a0, a1 = self._segs()
        b0, b1 = other._segs()
        return _segs_intersect(a0, a1, b0, b1)

    def intersects(self, other):
        return _generic_intersects(self, other)

    def crosses(self, other):
        return self.intersects(other) and not (self.contains(other)
                                               or other.contains(self))

    def touches(self, other):
        if not self.intersects(other):
            return False
        inter = self.intersection(other)
        return getattr(inter, "area", 0.0) < 1e-9

    def overlaps(self, other):
        if not isinstance(other, Polygon) or self.is_empty or other.is_empty:
            return False
        if self.contains(other) or other.contains(self):
            return False
        return self.intersection(other).area > 1e-9

    def intersection(self, other):
        if isinstance(other, Polygon):
            if self.is_empty or other.is_empty:
                return Polygon()
            out = _convex_clip(self._c, _ccw(other._c))
            if len(out) < 3:
                return Polygon()
            return Polygon(out)
        if isinstance(other, (MultiPolygon, GeometryCollection)):
            parts = [self.intersection(g) for g in other.geoms]
            parts = [p for p in parts if not p.is_empty]
            if not parts:
                return Polygon()
            return parts[0] if len(parts) == 1 else MultiPolygon(parts)
        if isinstance(other, LineString):
            return _clip_line_to_polygon(other, self)
        if isinstance(other, Point):
            return other if self.contains(other) else Polygon()
        return Polygon()

    def union(self, other):
        from .ops import unary_union
        return unary_union([self, other])

    def difference(self, other):
        if getattr(other, "is_empty", True) or not self.intersects(other):
            return self
        raise NotImplementedError(
            "shim: general polygon difference (only reached by the "
            "reference's single-shape mask path, not the committed CLI)")

    def distance(self, other):
        return _generic_distance(self, other)

    def _dist_to_points(self, pts):
        inside = self._contains_points(pts)
        if bool(np.any(inside)):
            return 0.0
        a, b = self._segs()
        return float(_seg_point_dist(pts, a, b).min())

    def representative_point(self):
        c = self.centroid
        if self.contains(c):
            return c
        # midpoint of the widest interior scanline interval at centroid-y
        y = c.y
        a, b = self._segs()
        xs = []
        for (x0, y0), (x1, y1) in zip(a, b):
            if (y0 <= y) != (y1 <= y):
                t = (y - y0) / (y1 - y0)
                xs.append(x0 + t * (x1 - x0))
        xs = sorted(xs)
        if len(xs) >= 2:
            widths = [(xs[i + 1] - xs[i], i)
                      for i in range(0, len(xs) - 1, 2)]
            _w, i = max(widths)
            return Point(0.5 * (xs[i] + xs[i + 1]), y)
        return Point(self._c[0])


def _ccw(c):
    return c if _ring_area(c) >= 0 else c[::-1]


def _clip_line_to_polygon(line, poly):
    pts = line._c
    inside = poly._contains_points(pts)
    if bool(np.all(inside)):
        return line
    if not bool(np.any(inside)):
        return LineString([])
    kept = pts[inside]
    return LineString(kept) if len(kept) >= 2 else LineString([])


class _MultiBase(BaseGeometry):
    def __init__(self, geoms=None):
        self.geoms = list(geoms or [])

    @property
    def is_empty(self):
        return not self.geoms or all(g.is_empty for g in self.geoms)

    @property
    def area(self):
        return float(sum(getattr(g, "area", 0.0) for g in self.geoms))

    @property
    def length(self):
        return float(sum(getattr(g, "length", 0.0) for g in self.geoms))

    @property
    def bounds(self):
        bs = [g.bounds for g in self.geoms if not g.is_empty]
        if not bs:
            return (0.0, 0.0, 0.0, 0.0)
        bs = np.asarray(bs)
        return (float(bs[:, 0].min()), float(bs[:, 1].min()),
                float(bs[:, 2].max()), float(bs[:, 3].max()))

    @property
    def centroid(self):
        ws = np.array([max(getattr(g, "area", 0.0), _EPS)
                       for g in self.geoms])
        cs = np.array([[g.centroid.x, g.centroid.y] for g in self.geoms])
        if len(cs) == 0:
            return Point(0.0, 0.0)
        w = ws / ws.sum()
        return Point(float(np.dot(w, cs[:, 0])), float(np.dot(w, cs[:, 1])))

    def __iter__(self):
        return iter(self.geoms)

    def __len__(self):
        return len(self.geoms)

    def distance(self, other):
        return min((g.distance(other) for g in self.geoms),
                   default=math.inf)

    def intersects(self, other):
        return any(g.intersects(other) for g in self.geoms)

    def intersection(self, other):
        parts = [g.intersection(other) for g in self.geoms]
        parts = [p for p in parts if not p.is_empty]
        if not parts:
            return Polygon()
        return parts[0] if len(parts) == 1 else GeometryCollection(parts)

    def representative_point(self):
        big = max(self.geoms, key=lambda g: getattr(g, "area", 0.0),
                  default=None)
        return big.representative_point() if big else Point(0.0, 0.0)


class MultiPoint(_MultiBase):
    geom_type = "MultiPoint"


class MultiLineString(_MultiBase):
    geom_type = "MultiLineString"


class MultiPolygon(_MultiBase):
    geom_type = "MultiPolygon"

    def __init__(self, geoms=None):
        super().__init__(geoms)
        self.geoms = [g if isinstance(g, Polygon) else Polygon(g)
                      for g in self.geoms]


class GeometryCollection(_MultiBase):
    geom_type = "GeometryCollection"


def _generic_intersects(a, b):
    if isinstance(b, _MultiBase):
        return b.intersects(a)
    if isinstance(a, Polygon) and isinstance(b, Polygon):
        if a._boundaries_cross(b):
            return True
        return a.contains(b) or b.contains(a) or \
            bool(a._contains_points(b._c[:1])[0]) or \
            bool(b._contains_points(a._c[:1])[0])
    if isinstance(a, Polygon) and isinstance(b, Point):
        return a.contains(b)
    if isinstance(b, Polygon):
        return _generic_intersects(b, a)
    if isinstance(a, Polygon) and isinstance(b, LineString):
        if bool(np.any(a._contains_points(b._c))):
            return True
        a0, a1 = a._segs()
        b0, b1 = b._segs()
        return _segs_intersect(a0, a1, b0, b1)
    if isinstance(a, LineString) and isinstance(b, LineString):
        a0, a1 = a._segs()
        b0, b1 = b._segs()
        return _segs_intersect(a0, a1, b0, b1)
    return a.distance(b) < 1e-9


def _generic_distance(a, b):
    if isinstance(b, _MultiBase):
        return b.distance(a)
    if isinstance(b, Point):
        return a._dist_to_points(np.array([[b.x, b.y]]))
    if _generic_intersects(a, b):
        return 0.0
    a0, a1 = a._segs()
    b0, b1 = b._segs()
    return _seg_seg_dist(a0, a1, b0, b1)
