"""Offline tests for the compare viewer's pure functional core.

The reference viewer (``studiosr/utils/compare.py``) is GUI-only and
untestable; ours separates a pure state/render core from the cv2 shell.
"""

import numpy as np

from studiosr_tpu.utils.compare import ViewerState, render


def _images(n=3, h=40, w=50):
    rng = np.random.default_rng(0)
    return [rng.integers(0, 256, (h, w, 3), np.uint8) for _ in range(n)]


def test_crop_rect_clamped_to_image():
    s = ViewerState(width=50, height=40, cursor=(0, 0), crop=16)
    y0, x0, y1, x1 = s.crop_rect
    assert (y0, x0) == (0, 0) and (y1 - y0, x1 - x0) == (16, 16)
    s2 = s.with_cursor(49, 39)
    y0, x0, y1, x1 = s2.crop_rect
    assert y1 <= 40 and x1 <= 50 and (y1 - y0, x1 - x0) == (16, 16)


def test_cursor_wraps_across_panorama():
    # The panorama tiles images horizontally; the cursor wraps modulo width.
    s = ViewerState(width=50, height=40, cursor=(0, 0)).with_cursor(50 + 7, 11)
    assert s.cursor == (7, 11)


def test_state_transitions_bounded():
    s = ViewerState(width=50, height=40, cursor=(25, 20), crop=12, zoom=64)
    for _ in range(100):
        s = s.with_crop_delta(-4)
    assert s.crop == 8  # floor
    for _ in range(100):
        s = s.with_crop_delta(+4)
    assert s.crop == 40  # min(h, w)
    for _ in range(200):
        s = s.with_zoom_delta(+4)
    assert s.zoom == 512
    assert s.toggled("show_diff").show_diff and not s.show_diff  # immutability


def test_render_shapes_and_zoom():
    imgs = _images()
    s = ViewerState(width=50, height=40, cursor=(25, 20), crop=16, zoom=64)
    panorama, strip = render(s, imgs)
    assert panorama.shape == (40, 150, 3)
    assert strip.shape == (64, 192, 3)


def test_render_zoom_is_nearest_neighbour():
    imgs = [np.arange(40 * 50 * 3, dtype=np.uint8).reshape(40, 50, 3)] * 2
    s = ViewerState(width=50, height=40, cursor=(25, 20), crop=16, zoom=32)
    _, strip = render(s, imgs)
    y0, x0, y1, x1 = s.crop_rect
    patch = imgs[0][y0:y1, x0:x1]
    assert np.array_equal(strip[:, :32][::2, ::2], patch)  # 2x NN upsample


def test_diff_mode_zeroes_identical_pixels():
    base = _images(1)[0]
    other = base.copy()
    other[5, 5] = 255 - other[5, 5]
    s = ViewerState(width=50, height=40, cursor=(25, 20), crop=16).toggled("show_diff")
    panorama, _ = render(s, [base, other])
    right = panorama[:, 50:]
    inside = np.ones((40, 50), bool)
    y0, x0, y1, x1 = s.crop_rect  # exclude the drawn crop box frame
    inside[y0:y1, x0] = inside[y0:y1, x1 - 1] = False
    inside[y0, x0:x1] = inside[y1 - 1, x0:x1] = False
    assert right[5, 5, 2] > 0  # red heat where pixels differ
    diff_red = right[..., 2] * inside
    assert diff_red.sum() == right[5, 5, 2]  # nowhere else


def test_crop_rect_larger_than_image_is_clamped():
    """crop > image must clamp the crop to the image instead of producing a
    negative origin (np.clip with min > max returns the max)."""
    s = ViewerState(width=48, height=40, cursor=(24, 20), crop=64)
    y0, x0, y1, x1 = s.crop_rect
    assert 0 <= y0 < y1 <= s.height
    assert 0 <= x0 < x1 <= s.width
    assert y1 - y0 == x1 - x0 == 40  # crop clamped to min(width, height)
