"""Image writers: BMP (screenshot parity with SDL_SaveBMP output,
reference: source/Renderer.cpp:184-187) and PNG.

The BMP writer emits a standard bottom-up 24-bit BI_RGB file with no external
dependencies; a native C++ writer in raytpu.native is used when built.  PNG
uses PIL when available.
"""

from __future__ import annotations

import struct

import numpy as np


def write_bmp(path: str, image: np.ndarray) -> None:
    """Write (H, W, 3) uint8 RGB to a 24-bit BMP."""
    img = np.asarray(image)
    assert img.dtype == np.uint8 and img.ndim == 3 and img.shape[2] == 3
    h, w, _ = img.shape
    row_size = (w * 3 + 3) & ~3
    pixel_bytes = row_size * h
    # BGR, bottom-up, row-padded to 4 bytes
    bgr = img[::-1, :, ::-1]
    rows = np.zeros((h, row_size), np.uint8)
    rows[:, : w * 3] = bgr.reshape(h, w * 3)
    header = struct.pack(
        "<2sIHHIIiiHHIIiiII",
        b"BM",
        14 + 40 + pixel_bytes,
        0,
        0,
        14 + 40,
        40,
        w,
        h,
        1,
        24,
        0,
        pixel_bytes,
        2835,
        2835,
        0,
        0,
    )
    with open(path, "wb") as f:
        f.write(header)
        f.write(rows.tobytes())


def read_bmp(path: str) -> np.ndarray:
    """Read a 24-bit BI_RGB BMP back to (H, W, 3) uint8 RGB."""
    with open(path, "rb") as f:
        data = f.read()
    assert data[:2] == b"BM"
    offset = struct.unpack_from("<I", data, 10)[0]
    w = struct.unpack_from("<i", data, 18)[0]
    h = struct.unpack_from("<i", data, 22)[0]
    bpp = struct.unpack_from("<H", data, 28)[0]
    assert bpp == 24, f"unsupported bpp {bpp}"
    row_size = (w * 3 + 3) & ~3
    flip = h > 0
    h = abs(h)
    arr = np.frombuffer(data, np.uint8, count=row_size * h, offset=offset)
    arr = arr.reshape(h, row_size)[:, : w * 3].reshape(h, w, 3)
    if flip:
        arr = arr[::-1]
    return arr[:, :, ::-1].copy()


def write_png(path: str, image: np.ndarray) -> None:
    from PIL import Image

    Image.fromarray(np.asarray(image)).save(path)


def write_image(path: str, image: np.ndarray) -> None:
    if path.lower().endswith(".bmp"):
        write_bmp(path, image)
    else:
        write_png(path, image)
