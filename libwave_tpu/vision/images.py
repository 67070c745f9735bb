"""Host-side image sequence loading (parity: wave_vision utils
``readImageSequence``, wave_vision/include/wave/vision/utils.hpp:139-156 and
wave_vision/src/utils.cpp).

The reference walks a directory with OpenCV, sorts frames and returns
``std::vector<cv::Mat>``. Here the host loads + decodes with PIL and returns
one dense ``(T, H, W)`` uint8 grayscale stack — the fixed-shape batch layout
the TPU front end (detector/descriptor/tracker) consumes directly. Frames
must share one resolution; a mismatch is an error, not a silent resize,
because fixed shapes are a framework invariant.
"""

from __future__ import annotations

import os
import re
from typing import List, Sequence

import numpy as np

_IMAGE_EXTS = (".png", ".jpg", ".jpeg", ".bmp", ".pgm", ".ppm", ".tif",
               ".tiff")


def _natural_key(name: str):
    """Sort 'frame2' before 'frame10' (the reference relies on zero-padded
    names; natural ordering also handles unpadded ones)."""
    return [int(t) if t.isdigit() else t for t in re.split(r"(\d+)", name)]


def list_image_sequence(directory: str) -> List[str]:
    """Sorted absolute paths of all image files directly under
    ``directory``."""
    if not os.path.isdir(directory):
        raise FileNotFoundError(f"not a directory: {directory}")
    names = [
        n for n in os.listdir(directory)
        if n.lower().endswith(_IMAGE_EXTS)
    ]
    names.sort(key=_natural_key)
    return [os.path.abspath(os.path.join(directory, n)) for n in names]


def load_image(path: str) -> np.ndarray:
    """Decode one image to (H, W) uint8 grayscale (the detector input
    format; cv::imread(..., IMREAD_GRAYSCALE) equivalent)."""
    from PIL import Image

    with Image.open(path) as im:
        return np.asarray(im.convert("L"), dtype=np.uint8)


def read_image_sequence(source) -> np.ndarray:
    """Load a directory or an explicit list of paths into a (T, H, W) uint8
    stack (readImageSequence parity, utils.hpp:139-156)."""
    paths: Sequence[str]
    if isinstance(source, (str, os.PathLike)):
        paths = list_image_sequence(os.fspath(source))
    else:
        paths = list(source)
    if not paths:
        raise ValueError("no images found")
    frames = [load_image(p) for p in paths]
    shape = frames[0].shape
    for p, f in zip(paths, frames):
        if f.shape != shape:
            raise ValueError(
                f"frame {p} has shape {f.shape}, expected {shape}: "
                "sequences must share one resolution"
            )
    return np.stack(frames)
