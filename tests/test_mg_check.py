# test_mg_check.py — in-bounds QC + pairwise feature extraction.
import numpy as np

from reasoning_image_generation_tpu.models.multigraph.scene import (
    empty_scene, circle_poly, rect_poly)
from reasoning_image_generation_tpu.models.multigraph.check import (
    check_scene_inside, compute_scene_features, pretty_print_features)


def _scene_with(shapes, lws=None):
    sc = empty_scene()
    for i, v in enumerate(shapes):
        sc["shape_verts"][i] = v
        sc["shape_lw"][i] = (lws or [1.5] * len(shapes))[i]
        sc["shape_alpha"][i] = 0.9
        sc["shape_valid"][i] = True
    return sc


def test_inside_check_passes_and_fails():
    ok = _scene_with([circle_poly((0, 0), 2.0)])
    rep = check_scene_inside(ok)
    assert rep["all_inside"] and rep["checked_count"] == 1

    bad = _scene_with([circle_poly((4.5, 0), 2.0)])  # pokes past x=+5
    rep2 = check_scene_inside(bad)
    assert not rep2["all_inside"]
    assert rep2["out_of_bounds"][0]["artist"] == "shape_0"
    assert "bbox_data" in rep2["out_of_bounds"][0]


def test_features_tangent():
    a = circle_poly((0, 0), 1.0)
    b = circle_poly((2.0, 0), 1.0)  # externally tangent at (1, 0)
    sc = _scene_with([a, b])
    f = compute_scene_features(sc, touch_tol=0.05)
    assert f["num_geometries"] == 2
    assert f["pairs"][0]["relation"] == "tangent"
    tp = f["tangency_points"][0]
    assert abs(tp[0] - 1.0) < 0.1 and abs(tp[1]) < 0.1


def test_features_crossing():
    a = circle_poly((0, 0), 1.5)
    b = rect_poly((0.5, -3), 1.0, 6.0)  # vertical bar through the circle
    sc = _scene_with([a, b])
    f = compute_scene_features(sc)
    assert f["pairs"][0]["relation"] == "crossing"
    assert f["pairs"][0]["n_boundary_intersections"] >= 2
    assert [0, 1] in f["partial_overlap_pairs"]
    assert "crossing" in pretty_print_features(f)


def test_features_disjoint_and_nested():
    a = circle_poly((0, 0), 2.0)
    b = circle_poly((0, 0), 0.5)   # nested
    c = circle_poly((4.4, 4.4), 0.4)  # far away
    sc = _scene_with([a, b, c])
    f = compute_scene_features(sc)
    rel = {(p["i"], p["j"]): p["relation"] for p in f["pairs"]}
    assert rel[(0, 1)] == "contains_or_nested"
    assert rel[(0, 2)] == "disjoint"


def test_geos_features_reference_vocabulary():
    """The reference's compute_geos_features crashes upstream (math.lg10,
    multi_combinator.py:127); ours emits its intended key vocabulary."""
    from reasoning_image_generation_tpu.models.multigraph.scene import build_scene
    from reasoning_image_generation_tpu.models.multigraph.check import (
        compute_scene_features)
    scene, meta = build_scene(5, "adjacent", 1.3)
    f = compute_scene_features(scene)
    expected = {"tangency_points_count", "crossing_points_count",
                "intersection_points", "intersection_points_count",
                "partial_overlaps_pairs", "partial_overlaps_count",
                "parallel_edge_pairs_count", "per_geo_info"}
    assert expected <= set(f)
    assert f["tangency_points_count"] == len(f["tangency_points"])
    assert f["intersection_points_count"] == len(f["intersection_points"])
    for info in f["per_geo_info"]:
        assert {"idx", "n_segments", "straight_chains",
                "curved_junctions", "n_angles"} <= set(info)
        assert info["n_segments"] > 0
    # a rectangle pair has parallel edges -> counter is exercised
    assert f["parallel_edge_pairs_count"] >= 0
