"""Image I/O: linear-float loading and PNG/JPG/HDR saving.

Replaces the reference's stb-based ``Image`` class
(``/root/reference/src/image.cpp:14-90``): LDR images are loaded with gamma
1.0 (raw values as linear, matching ``stbi_ldr_to_hdr_gamma(1.f)`` at
scene.cpp:109), HDR via imageio.  Device-side bilinear sampling lives in
:mod:`radish_pt_tpu.scene.device_scene`.
"""

from __future__ import annotations

import os

import numpy as np


def load_image(path: str, flip_vertical: bool = True) -> np.ndarray:
    """Load an image as linear float32 RGB [H, W, 3].

    LDR formats are divided by 255 with NO gamma decode (gamma 1.0, like the
    reference).  ``flip_vertical`` mirrors ``stbi_set_flip_vertically_on_load``
    (on for textures, off for env maps — scene.cpp:110,134-136).
    """
    ext = os.path.splitext(path)[1].lower()
    if ext in (".hdr", ".exr"):
        import imageio.v3 as iio

        img = np.asarray(iio.imread(path), dtype=np.float32)
    else:
        from PIL import Image as PILImage

        with PILImage.open(path) as im:
            img = np.asarray(im.convert("RGB"), dtype=np.float32) / 255.0
    if img.ndim == 2:
        img = np.repeat(img[..., None], 3, axis=-1)
    if img.shape[-1] > 3:
        img = img[..., :3]
    if flip_vertical:
        img = img[::-1]
    return np.ascontiguousarray(img, dtype=np.float32)


def save_image(path: str, img: np.ndarray) -> None:
    """Save float RGB [H, W, 3] in [0,1] (PNG/JPG) or raw HDR floats (.hdr)."""
    ext = os.path.splitext(path)[1].lower()
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    if ext == ".hdr":
        import imageio.v3 as iio

        iio.imwrite(path, np.asarray(img, dtype=np.float32))
        return
    from PIL import Image as PILImage

    arr = np.clip(np.asarray(img) * 255.0, 0, 255).astype(np.uint8)
    PILImage.fromarray(arr).save(path)
