"""Line-image loading and preprocessing (offline numpy/cv2 path).

Behavior parity (utils/io.py:98-115, utils/preprocessing.py:29-62):
  * read_img: grayscale imread -> remove_whitespace(thresh=127) -> cubic
    resize to the target height preserving aspect;
  * remove_whitespace: crop to the bounding rows/cols that contain at least
    one pixel below the threshold (exclusive upper bound quirk preserved:
    the last dark row/col is excluded, img[r0:r_last, c0:c_last]);
  * pad_img: right-pad with white (255) to a fixed width.
"""

from __future__ import annotations

from os import PathLike

import cv2
import numpy as np


def remove_whitespace(img: np.ndarray, thresh: float) -> np.ndarray:
    """Crop to the dark-pixel bounding box, exclusive of the last dark
    row/col (reference quirk: img[r0:r_last, c0:c_last])."""
    dark = img < thresh
    row_has = dark.any(axis=1)
    col_has = dark.any(axis=0)
    r0 = int(np.argmax(row_has))
    r1 = len(row_has) - 1 - int(np.argmax(row_has[::-1]))
    c0 = int(np.argmax(col_has))
    c1 = len(col_has) - 1 - int(np.argmax(col_has[::-1]))
    return img[r0:r1, c0:c1]


def read_img(path: PathLike | str, height: int) -> np.ndarray:
    img = cv2.imread(str(path), cv2.IMREAD_GRAYSCALE)
    if img is None:
        raise FileNotFoundError(path)
    img = remove_whitespace(img, thresh=127)
    h, w = img.shape
    return cv2.resize(img, (height * w // h, height), interpolation=cv2.INTER_CUBIC)


def pad_img(img: np.ndarray, width: int, height: int) -> np.ndarray:
    pad_len = width - img.shape[1]
    whites = np.ones((height, pad_len)) * 255
    return np.concatenate([img, whites], axis=1).astype("float32")
