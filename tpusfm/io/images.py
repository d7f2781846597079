"""Dataset directory loading with downscale.

Equivalent of SfM::setImagesDirectory (SfMToyLib/SfM.cpp:98-138):
scan a directory for .jpg/.png, load each, optionally downscale. Images
are normalized to a common (H, W) — the batched TPU pipeline needs one
static shape — by resizing everything to the first image's size (datasets
for this pipeline are same-camera sequences, as the shared-intrinsics
model assumes).
"""
from __future__ import annotations

import dataclasses
import os
from typing import List

import numpy as np

_EXTS = (".jpg", ".jpeg", ".png", ".ppm", ".pgm", ".bmp")


@dataclasses.dataclass
class ImageSet:
    gray: np.ndarray        # (V, H, W) float32 in [0, 1]
    rgb: np.ndarray         # (V, H, W, 3) uint8
    paths: List[str]

    @property
    def num_views(self) -> int:
        return self.gray.shape[0]

    @property
    def shape(self):
        return self.gray.shape[1:]


def _load_one(path: str):
    from PIL import Image

    with Image.open(path) as im:
        return np.asarray(im.convert("RGB"))


def load_image_directory(directory: str, downscale: float = 1.0) -> ImageSet:
    """Load every image in a directory, sorted by filename.

    ``downscale`` matches the reference CLI's --downscale factor
    (main.cpp:47, applied at SfM.cpp:124-135): images are resized to
    1/downscale of their original resolution.

    Fast path: the native threaded decoder (csrc/imageio.cc via
    tpusfm.native, ~50x faster than PIL on JPEG sequences); falls back
    to PIL when the native library is unavailable.
    """
    paths = sorted(
        os.path.join(directory, f)
        for f in os.listdir(directory)
        if f.lower().endswith(_EXTS)
    )
    if not paths:
        raise FileNotFoundError(f"no images found in {directory!r}")

    from tpusfm import native

    if native.available():
        size = native.image_size(paths[0])
        if size is not None:
            h, w = size
            if downscale and downscale != 1.0:
                h, w = int(round(h / downscale)), int(round(w / downscale))
            out = native.load_images(paths, h, w)
            if out is not None:
                rgb, gray = out
                return ImageSet(gray=gray, rgb=rgb, paths=paths)

    rgbs = []
    target = None
    for p in paths:
        img = _load_one(p)
        if target is None:
            h, w = img.shape[:2]
            if downscale and downscale != 1.0:
                h, w = int(round(h / downscale)), int(round(w / downscale))
            target = (h, w)
        if img.shape[:2] != target:
            from PIL import Image

            img = np.asarray(
                Image.fromarray(img).resize((target[1], target[0]), Image.BILINEAR)
            )
        rgbs.append(img)

    rgb = np.stack(rgbs).astype(np.uint8)
    gray = (
        0.299 * rgb[..., 0] + 0.587 * rgb[..., 1] + 0.114 * rgb[..., 2]
    ).astype(np.float32) / 255.0
    return ImageSet(gray=gray, rgb=rgb, paths=paths)


def load_image(path: str, downscale: float = 1.0):
    """Load a single image -> (gray (H, W) float32 [0,1], rgb (H, W, 3) u8)."""
    img = _load_one(path)
    if downscale and downscale != 1.0:
        from PIL import Image

        h, w = img.shape[:2]
        img = np.asarray(Image.fromarray(img).resize(
            (int(round(w / downscale)), int(round(h / downscale))), Image.BILINEAR))
    rgb = img.astype(np.uint8)
    gray = (
        0.299 * rgb[..., 0] + 0.587 * rgb[..., 1] + 0.114 * rgb[..., 2]
    ).astype(np.float32) / 255.0
    return gray, rgb
