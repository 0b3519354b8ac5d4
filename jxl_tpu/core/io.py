"""Image file I/O.

Replaces the reference's `image` crate + jpegxl-rs decode path
(`benchmark-jpegxl/src/image_reader.rs:317-439`): reads any PIL-supported
format (PNG/PPM/JPEG/... — covers the reference's 16-format enum) into numpy
RGB u8, and reads/writes this framework's own `.jxt` bitstream via the codec.

A small pure-numpy PPM/PGM codec is included so the framework keeps working
even without PIL.
"""

from __future__ import annotations

import os

import numpy as np

from jxl_tpu.core.image import ColorType, ImageFileData, ImageFormat, format_from_path

try:
    from PIL import Image as _PILImage

    _HAVE_PIL = True
except Exception:  # pragma: no cover
    _HAVE_PIL = False


def _read_ppm(path: str) -> np.ndarray:
    with open(path, "rb") as f:
        data = f.read()
    parts = []
    idx = 0
    # parse header tokens, skipping comments
    while len(parts) < 4:
        nl = data.find(b"\n", idx)
        line = data[idx : nl if nl != -1 else len(data)]
        idx = nl + 1
        line = line.split(b"#")[0]
        parts.extend(line.split())
    magic, w, h, maxval = parts[0], int(parts[1]), int(parts[2]), int(parts[3])
    raw = np.frombuffer(data[idx:], dtype=np.uint8)
    if magic == b"P6":
        return raw[: w * h * 3].reshape(h, w, 3)
    if magic == b"P5":
        g = raw[: w * h].reshape(h, w)
        return np.stack([g, g, g], axis=-1)
    raise ValueError(f"unsupported PNM magic {magic!r}")


def _write_ppm(path: str, rgb: np.ndarray) -> None:
    h, w = rgb.shape[:2]
    with open(path, "wb") as f:
        f.write(b"P6\n%d %d\n255\n" % (w, h))
        f.write(np.ascontiguousarray(rgb, dtype=np.uint8).tobytes())


def read_image(path: str) -> np.ndarray:
    """Read an image file to RGB uint8 [H, W, 3]."""
    fmt = format_from_path(path)
    if fmt == ImageFormat.Jxt:
        from jxl_tpu.codec.decode import decode_file

        return decode_file(path)
    if fmt == ImageFormat.Pnm or not _HAVE_PIL:
        return _read_ppm(path)
    img = _PILImage.open(path).convert("RGB")
    return np.asarray(img, dtype=np.uint8)


def write_image(path: str, rgb: np.ndarray) -> None:
    """Write RGB uint8 [H, W, 3] to a file (format from extension)."""
    rgb = np.asarray(rgb, dtype=np.uint8)
    if format_from_path(path) == ImageFormat.Pnm or not _HAVE_PIL:
        _write_ppm(path, rgb)
        return
    _PILImage.fromarray(rgb, mode="RGB").save(path)


def read_image_metadata(path: str, test_set: str = "", commit: str = "") -> ImageFileData:
    """Build the 13-column metadata record for a file.

    For `.jxt` files, distance/effort/original-name come from the container
    header (the reference instead re-parses them from the filename,
    `image_reader.rs:385-411`).
    """
    fmt = format_from_path(path)
    file_size = os.path.getsize(path)
    name = os.path.basename(path)
    if fmt == ImageFormat.Jxt:
        from jxl_tpu.codec.container import read_header

        hdr = read_header(path)
        return ImageFileData(
            image_name=name,
            commit=commit or hdr.strategy_name,
            test_set=test_set,
            file_path=path,
            width=hdr.width,
            height=hdr.height,
            file_size=file_size,
            raw_size=hdr.width * hdr.height * 3,
            color_space=ColorType.Rgb8,
            format=fmt,
            jxl_orig_image_name=hdr.orig_name,
            jxl_distance=hdr.distance,
            jxl_effort=hdr.effort,
        )
    rgb = read_image(path)
    h, w = rgb.shape[:2]
    return ImageFileData(
        image_name=name,
        commit=commit,
        test_set=test_set,
        file_path=path,
        width=w,
        height=h,
        file_size=file_size,
        raw_size=w * h * 3,
        color_space=ColorType.Rgb8,
        format=fmt,
    )
