"""Image decode/encode.

Covers the reference's codin surface (SURVEY §2.10ext): stb-style decode of
PNG/JPEG (via PIL here) and PNG/QOI/PPM encoders selected by output suffix
(driver.c:839-874). QOI uses the native C encoder (raytracing_c_tpu/native)
when available, with a pure-Python fallback.
"""

from __future__ import annotations

import io
import os

import numpy as np


def load_image_rgb_u8(path: str) -> np.ndarray:
    """Decode any PIL-supported image to (H, W, 3) u8."""
    from PIL import Image

    with Image.open(path) as im:
        return np.asarray(im.convert("RGB"), np.uint8)


def decode_image_rgb_u8(data: bytes) -> np.ndarray:
    """Decode an in-memory image (glTF bufferView images)."""
    from PIL import Image

    with Image.open(io.BytesIO(data)) as im:
        return np.asarray(im.convert("RGB"), np.uint8)


# ---------------------------------------------------------------------------
# Encoders
# ---------------------------------------------------------------------------


def write_png(path: str, img: np.ndarray) -> None:
    from PIL import Image

    Image.fromarray(img, "RGB").save(path, "PNG")


def write_ppm(path: str, img: np.ndarray) -> None:
    """Binary P6 PPM."""
    h, w, _ = img.shape
    with open(path, "wb") as f:
        f.write(f"P6\n{w} {h}\n255\n".encode())
        f.write(np.ascontiguousarray(img).tobytes())


def qoi_encode(img: np.ndarray) -> bytes:
    """QOI encode (spec: qoiformat.org). Tries the native C codec first."""
    from raytracing_c_tpu.native import qoi_native

    enc = qoi_native()
    if enc is not None:
        return enc.encode(img)
    return _qoi_encode_py(img)


def qoi_decode(data: bytes) -> np.ndarray:
    from raytracing_c_tpu.native import qoi_native

    dec = qoi_native()
    if dec is not None:
        return dec.decode(data)
    return _qoi_decode_py(data)


def write_qoi(path: str, img: np.ndarray) -> None:
    with open(path, "wb") as f:
        f.write(qoi_encode(img))


def write_image(path: str, img: np.ndarray, warn=print) -> None:
    """Format dispatch by suffix with the reference's default-to-PNG warning
    (driver.c:839-851)."""
    ext = os.path.splitext(path)[1].lower()
    if ext == ".png":
        write_png(path, img)
    elif ext == ".qoi":
        write_qoi(path, img)
    elif ext == ".ppm":
        write_ppm(path, img)
    else:
        warn(
            f"output format not recognized for output path '{path}', "
            "defaulting to png"
        )
        write_png(path, img)


# ---------------------------------------------------------------------------
# Pure-Python QOI (fallback; the native codec is the fast path)
# ---------------------------------------------------------------------------

_QOI_OP_INDEX = 0x00
_QOI_OP_DIFF = 0x40
_QOI_OP_LUMA = 0x80
_QOI_OP_RUN = 0xC0
_QOI_OP_RGB = 0xFE
_QOI_OP_RGBA = 0xFF


def _qoi_encode_py(img: np.ndarray) -> bytes:
    h, w, c = img.shape
    assert c == 3
    out = bytearray()
    out += b"qoif"
    out += w.to_bytes(4, "big") + h.to_bytes(4, "big")
    out += bytes([3, 0])  # channels, colorspace=sRGB

    index = [(0, 0, 0, 0)] * 64
    prev = (0, 0, 0, 255)
    run = 0
    flat = img.reshape(-1, 3)
    for px in flat:
        cur = (int(px[0]), int(px[1]), int(px[2]), 255)
        if cur == prev:
            run += 1
            if run == 62:
                out.append(_QOI_OP_RUN | (run - 1))
                run = 0
            continue
        if run:
            out.append(_QOI_OP_RUN | (run - 1))
            run = 0
        hidx = (cur[0] * 3 + cur[1] * 5 + cur[2] * 7 + cur[3] * 11) % 64
        if index[hidx] == cur:
            out.append(_QOI_OP_INDEX | hidx)
        else:
            index[hidx] = cur
            dr = (cur[0] - prev[0]) & 0xFF
            dg = (cur[1] - prev[1]) & 0xFF
            db = (cur[2] - prev[2]) & 0xFF
            dr = dr - 256 if dr > 127 else dr
            dg = dg - 256 if dg > 127 else dg
            db = db - 256 if db > 127 else db
            if -2 <= dr <= 1 and -2 <= dg <= 1 and -2 <= db <= 1:
                out.append(
                    _QOI_OP_DIFF | ((dr + 2) << 4) | ((dg + 2) << 2) | (db + 2)
                )
            else:
                dr_dg = dr - dg
                db_dg = db - dg
                if -32 <= dg <= 31 and -8 <= dr_dg <= 7 and -8 <= db_dg <= 7:
                    out.append(_QOI_OP_LUMA | (dg + 32))
                    out.append(((dr_dg + 8) << 4) | (db_dg + 8))
                else:
                    out.append(_QOI_OP_RGB)
                    out += bytes(cur[:3])
        prev = cur
    if run:
        out.append(_QOI_OP_RUN | (run - 1))
    out += b"\x00" * 7 + b"\x01"
    return bytes(out)


def _qoi_decode_py(data: bytes) -> np.ndarray:
    assert data[:4] == b"qoif"
    w = int.from_bytes(data[4:8], "big")
    h = int.from_bytes(data[8:12], "big")
    pos = 14
    out = np.zeros((w * h, 3), np.uint8)
    index = [(0, 0, 0, 0)] * 64
    px = (0, 0, 0, 255)
    i = 0
    while i < w * h:
        b0 = data[pos]
        pos += 1
        if b0 == _QOI_OP_RGB:
            px = (data[pos], data[pos + 1], data[pos + 2], px[3])
            pos += 3
        elif b0 == _QOI_OP_RGBA:
            px = tuple(data[pos : pos + 4])
            pos += 4
        elif (b0 & 0xC0) == _QOI_OP_INDEX:
            px = index[b0 & 0x3F]
        elif (b0 & 0xC0) == _QOI_OP_DIFF:
            dr = ((b0 >> 4) & 3) - 2
            dg = ((b0 >> 2) & 3) - 2
            db = (b0 & 3) - 2
            px = ((px[0] + dr) & 255, (px[1] + dg) & 255, (px[2] + db) & 255, px[3])
        elif (b0 & 0xC0) == _QOI_OP_LUMA:
            dg = (b0 & 0x3F) - 32
            b1 = data[pos]
            pos += 1
            dr = dg + ((b1 >> 4) & 0xF) - 8
            db = dg + (b1 & 0xF) - 8
            px = ((px[0] + dr) & 255, (px[1] + dg) & 255, (px[2] + db) & 255, px[3])
        elif (b0 & 0xC0) == _QOI_OP_RUN:
            run = (b0 & 0x3F) + 1
            out[i : i + run] = px[:3]
            i += run
            continue
        hidx = (px[0] * 3 + px[1] * 5 + px[2] * 7 + px[3] * 11) % 64
        index[hidx] = px
        out[i] = px[:3]
        i += 1
    return out.reshape(h, w, 3)
