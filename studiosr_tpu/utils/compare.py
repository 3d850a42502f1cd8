"""Interactive side-by-side image comparison (cv2 GUI).

Same capability as the reference ``studiosr/utils/compare.py``: shows the
given images side by side with a mouse-tracked crop rectangle and a zoomed
crop strip. Keys: ESC quit, c capture the crop strip to ./captures,
a/s shrink/grow the crop box, z/x shrink/grow the zoom size.
"""

from __future__ import annotations

import os
import time
from typing import List

import numpy as np

__all__ = ["compare"]


def _clip(value, lo, hi):
    return min(max(value, lo), hi)


class _CropTracker:
    """Tracks the mouse and derives the crop rectangle."""

    def __init__(self, width: int, height: int, crop_size: int = 64) -> None:
        self.w, self.h = width, height
        self.x, self.y = width // 2, height // 2
        self.size = crop_size

    def on_mouse(self, event, x, y, flags, param) -> None:
        import cv2

        if event == cv2.EVENT_MOUSEMOVE:
            self.x, self.y = x % self.w, y % self.h

    def rect(self):
        s = self.size
        x1 = _clip(self.x - s // 2, 0, self.w - s)
        y1 = _clip(self.y - s // 2, 0, self.h - s)
        return x1, y1, x1 + s, y1 + s

    def resize(self, diff: int) -> None:
        self.size = _clip(self.size + diff, 8, min(self.w, self.h))


def compare(images: List[np.ndarray], crop_size: int = 64, zoom_size: int = 256) -> None:
    """Open the interactive viewer on a list of same-sized BGR images."""
    import cv2

    cv2.namedWindow("image-compare")
    cv2.namedWindow("image-crops")
    tracker = _CropTracker(images[0].shape[1], images[0].shape[0], crop_size)
    cv2.setMouseCallback("image-compare", tracker.on_mouse, None)

    while True:
        x1, y1, x2, y2 = tracker.rect()
        views, crops = [], []
        for image in images:
            view = image.copy()
            crops.append(
                cv2.resize(image[y1:y2, x1:x2], (zoom_size, zoom_size), interpolation=cv2.INTER_NEAREST)
            )
            cv2.rectangle(view, (x1, y1), (x2 - 1, y2 - 1), (0, 255, 0), 1)
            views.append(view)

        cv2.imshow("image-compare", np.concatenate(views, 1))
        cv2.imshow("image-crops", np.concatenate(crops, 1))
        key = cv2.waitKey(30)

        if key == 27:  # ESC
            break
        elif key in (ord("c"), ord("C")):
            os.makedirs("./captures", exist_ok=True)
            capture_path = os.path.join("./captures", f"{time.time_ns()}.png")
            cv2.imwrite(capture_path, np.concatenate(crops, 1))
            print("Capture Image ->", capture_path)
        elif key in (ord("a"), ord("A")):
            tracker.resize(-4)
        elif key in (ord("s"), ord("S")):
            tracker.resize(+4)
        elif key in (ord("z"), ord("Z")):
            zoom_size = _clip(zoom_size - 4, 32, 512)
        elif key in (ord("x"), ord("X")):
            zoom_size = _clip(zoom_size + 4, 32, 512)
