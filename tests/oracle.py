# oracle.py — test-only harness that invokes the reference CPU renderer.
"""Imports the reference implementation (read-only, /root/reference) and uses
it as a golden oracle for pixel-parity tests, per the test strategy in
SURVEY.md §4.  Nothing here ships in the framework."""
import sys
import tempfile

import numpy as np

from .conftest import REFERENCE_SRC


def _import_reference():
    p = str(REFERENCE_SRC)
    if p not in sys.path:
        sys.path.insert(0, p)
    import generator as ref_generator  # noqa
    import config as ref_config  # noqa
    return ref_generator, ref_config


def render_reference(elements, W=512, H=512, use_grid=False, grid_size=3,
                     bg_color=(255, 255, 255)):
    """Render element dicts with the reference pipeline; returns RGB u8."""
    ref_generator, ref_config = _import_reference()
    with tempfile.TemporaryDirectory() as td:
        cfg = ref_config.GenConfig(out_dir=td, seed=0)
        gen = ref_generator.RPMGenerator(cfg)
        bgr = gen._render_elements_to_canvas(W, H, bg_color, elements,
                                             use_grid=use_grid, grid_size=grid_size)
    return bgr[..., ::-1].copy()  # BGR -> RGB


def render_reference_shape(elem, W=512, H=512, antialias_mode="fast",
                           scale=1, soft_blur=7):
    """Render one element dict via reference Shape.draw directly (the only
    entry point exposing the soft/hq AA modes, reference
    src/shapes.py:209,658-665).  Returns RGB u8."""
    _import_reference()
    import shapes as ref_shapes
    img = np.full((H, W, 3), 255, np.uint8)  # BGR canvas
    shape = ref_shapes.Shape(kind=elem["kind"], size=elem["size"],
                             fill=elem["fill"],
                             stroke_width=elem["stroke_width"])
    out = shape.draw(img, center=elem["center"], angle=elem.get("angle", 0.0),
                     color=elem["color"], antialias_mode=antialias_mode,
                     scale=scale, soft_blur=soft_blur)
    return out[..., ::-1].copy()


def ssim(a: np.ndarray, b: np.ndarray) -> float:
    """Mean SSIM on grayscale with an 11x11 Gaussian window (cv2-based)."""
    import cv2
    a = cv2.cvtColor(a, cv2.COLOR_RGB2GRAY).astype(np.float64)
    b = cv2.cvtColor(b, cv2.COLOR_RGB2GRAY).astype(np.float64)
    C1, C2 = (0.01 * 255) ** 2, (0.03 * 255) ** 2
    blur = lambda x: cv2.GaussianBlur(x, (11, 11), 1.5)
    mu_a, mu_b = blur(a), blur(b)
    saa = blur(a * a) - mu_a * mu_a
    sbb = blur(b * b) - mu_b * mu_b
    sab = blur(a * b) - mu_a * mu_b
    num = (2 * mu_a * mu_b + C1) * (2 * sab + C2)
    den = (mu_a ** 2 + mu_b ** 2 + C1) * (saa + sbb + C2)
    return float(np.mean(num / den))
