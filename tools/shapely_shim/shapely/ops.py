# ops — unary_union over the shim geometries.
#
# Approximation: disjoint/abutting polygons (the only arrangements the
# reference's adjacent path feeds this) union to a MultiPolygon whose
# area is the member sum; genuinely overlapping pairs fall back to the
# same wrapper, so its area over-counts the overlap — acceptable for the
# QC/feature call sites, which guard with try/except.
from ._core import Polygon, MultiPolygon, _MultiBase


def unary_union(geoms):
    if isinstance(geoms, _MultiBase):
        geoms = list(geoms.geoms)
    geoms = [g for g in geoms if not getattr(g, "is_empty", True)]
    if not geoms:
        return Polygon()
    if len(geoms) == 1:
        return geoms[0]
    return MultiPolygon([g for g in geoms if isinstance(g, Polygon)])
