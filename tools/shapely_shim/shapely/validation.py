# validation — shim geometries are valid by construction.


def make_valid(geom):
    return geom


def explain_validity(geom):
    return "Valid Geometry"
