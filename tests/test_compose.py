# test_compose.py — grid composition parity vs reference layout.py.
import sys

import numpy as np
import pytest

from .conftest import REFERENCE_SRC, has_reference
from .oracle import ssim

from reasoning_image_generation_tpu.ops.compose import build_layout, compose_grid

pytestmark = pytest.mark.skipif(not has_reference(), reason="reference not mounted")


def _ref_compose(state_imgs, option_imgs, W=512, H=512, num_options=4,
                 tmpdir="/tmp"):
    p = str(REFERENCE_SRC)
    if p not in sys.path:
        sys.path.insert(0, p)
    import layout as ref_layout
    states = [{"state_img": s[..., ::-1].copy(), "state_path": None}
              for s in state_imgs]       # reference expects BGR
    candidates = [{"img": o[..., ::-1].copy(), "path": None,
                   "is_correct": i == 0} for i, o in enumerate(option_imgs)]
    grid_im, cells_meta, seq_meta, opts_meta, qp, grid_h, cell = \
        ref_layout.compose_grid(W=W, H=H, states=states, candidates=candidates,
                                sample_dir=tmpdir, num_options=num_options,
                                margin=20, padding_v=20, show_labels=True,
                                show_border=True)
    return grid_im[..., ::-1].copy(), cells_meta, grid_h, cell


def _content(seed, W=512, H=512):
    rng = np.random.default_rng(seed)
    img = np.full((H, W, 3), 255, np.uint8)
    for _ in range(3):
        x, y = rng.integers(0, W - 120, 2)
        img[y:y + 100, x:x + 100] = rng.integers(0, 255, 3)
    return img


def test_grid_composition_parity(tmp_path):
    n_states = 3
    states = [_content(i) for i in range(n_states)]
    options = [_content(10 + i) for i in range(4)]

    layout = build_layout(512, 512, n_states=n_states, num_options=4)
    ours = np.asarray(compose_grid(layout, np.stack(states), np.stack(options)))

    ref, cells_meta, grid_h, cell = _ref_compose(states, options,
                                                 tmpdir=str(tmp_path))
    assert layout.grid_h == grid_h
    assert layout.cell_size == cell
    # static geometry identical
    for ours_c, ref_c in zip(layout.cells_meta, cells_meta):
        assert ours_c["bbox"] == ref_c["bbox"]
        assert ours_c["label"] == ref_c["label"]
    s = ssim(ours, ref)
    assert s > 0.99, f"grid ssim={s:.4f}"


def test_grid_composition_parity_L6(tmp_path):
    n_states = 5
    states = [_content(i) for i in range(n_states)]
    options = [_content(20 + i) for i in range(4)]
    layout = build_layout(512, 512, n_states=n_states, num_options=4)
    ours = np.asarray(compose_grid(layout, np.stack(states), np.stack(options)))
    ref, cells_meta, grid_h, cell = _ref_compose(states, options,
                                                 tmpdir=str(tmp_path))
    assert layout.grid_h == grid_h and layout.cell_size == cell
    s = ssim(ours, ref)
    assert s > 0.99, f"grid ssim={s:.4f}"
