"""PNG/QOI/PPM encoders (reference driver.c:839-874) + native codec."""

import os

import numpy as np
import pytest

from raytracing_c_tpu.io import image_io


@pytest.fixture
def img(rng):
    # mix of flat runs and noise to exercise all QOI ops
    a = rng.integers(0, 256, (33, 47, 3), dtype=np.uint8)
    a[:10, :20] = [10, 200, 30]
    a[20:, 30:] = a[20:, 30:] // 2 * 2
    return a


def test_qoi_roundtrip_python(img):
    data = image_io._qoi_encode_py(img)
    out = image_io._qoi_decode_py(data)
    assert (out == img).all()


def test_qoi_roundtrip_native(img):
    from raytracing_c_tpu.native import qoi_native

    codec = qoi_native()
    if codec is None:
        pytest.skip("no C compiler available")
    data = codec.encode(img)
    assert data[:4] == b"qoif"
    out = codec.decode(data)
    assert (out == img).all()
    # cross-check: native bytes decode with the python decoder too
    out2 = image_io._qoi_decode_py(data)
    assert (out2 == img).all()
    # and python bytes decode natively
    out3 = codec.decode(image_io._qoi_encode_py(img))
    assert (out3 == img).all()


def test_ppm_roundtrip(tmp_path, img):
    p = str(tmp_path / "x.ppm")
    image_io.write_ppm(p, img)
    with open(p, "rb") as f:
        assert f.readline() == b"P6\n"
        w, h = map(int, f.readline().split())
        assert (w, h) == (47, 33)
        assert f.readline() == b"255\n"
        raw = np.frombuffer(f.read(), np.uint8).reshape(33, 47, 3)
    assert (raw == img).all()


def test_png_roundtrip(tmp_path, img):
    p = str(tmp_path / "x.png")
    image_io.write_png(p, img)
    back = image_io.load_image_rgb_u8(p)
    assert (back == img).all()


def test_dispatch_unknown_defaults_to_png(tmp_path, img):
    warnings = []
    p = str(tmp_path / "x.bmpish")
    image_io.write_image(p, img, warn=warnings.append)
    assert warnings and "defaulting to png" in warnings[0]
    assert os.path.exists(p)
