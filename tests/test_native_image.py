"""Native JPEG decode + resize parity vs PIL (native/image.cpp).

Strategy mirrors tests/test_native_bpe.py: the native path is opportunistic
(skip if the toolchain can't build it) and must match the PIL reference —
exact resize within 1 LSB per channel; the prescale decode within a small
tolerance on bandlimited content.
"""

import io

import numpy as np
import pytest

from PIL import Image

from pgica_tpu.data import native_image as ni


def _require_lib():
    if ni.get_library() is None:
        pytest.skip("native image library unavailable (no toolchain?)")


def _jpeg(w, h, seed=0, quality=90):
    r = np.random.default_rng(seed)
    base = (r.random((max(h // 100, 4), max(w // 100, 4), 3)) * 255).astype(np.uint8)
    img = np.asarray(Image.fromarray(base).resize((w, h), Image.BICUBIC), np.uint8)
    buf = io.BytesIO()
    Image.fromarray(img).save(buf, format="JPEG", quality=quality)
    return buf.getvalue()


class TestNativeResize:
    @pytest.mark.parametrize("h,w", [(480, 640), (100, 150), (224, 224), (300, 200)])
    def test_resize_matches_pil_within_1lsb(self, h, w):
        _require_lib()
        r = np.random.default_rng(1)
        img = (r.random((h, w, 3)) * 255).astype(np.uint8)
        want = np.asarray(Image.fromarray(img).resize((224, 224), Image.BILINEAR), np.uint8)
        got = ni.resize_rgb(img, 224)
        assert got is not None
        d = np.abs(got.astype(int) - want.astype(int))
        assert d.max() <= 1, f"max diff {d.max()}"


class TestNativeDecode:
    def test_exact_decode_resize_matches_pil_within_1lsb(self):
        _require_lib()
        data = _jpeg(640, 480)
        want = np.asarray(
            Image.open(io.BytesIO(data)).convert("RGB").resize((224, 224), Image.BILINEAR),
            np.uint8,
        )
        got = ni.decode_resize_jpeg(data, 224)
        assert got is not None
        d = np.abs(got.astype(int) - want.astype(int))
        assert d.max() <= 1

    def test_prescale_close_to_pil(self):
        _require_lib()
        data = _jpeg(1600, 1200)
        want = np.asarray(
            Image.open(io.BytesIO(data)).convert("RGB").resize((224, 224), Image.BILINEAR),
            np.uint8,
        )
        got = ni.decode_resize_jpeg(data, 224, prescale=True)
        assert got is not None
        d = np.abs(got.astype(int) - want.astype(int))
        assert d.mean() < 2.0 and d.max() <= 16, (d.mean(), d.max())

    def test_grayscale_jpeg_decodes_to_rgb(self):
        _require_lib()
        r = np.random.default_rng(2)
        gray = (r.random((120, 160)) * 255).astype(np.uint8)
        buf = io.BytesIO(); Image.fromarray(gray, "L").save(buf, format="JPEG")
        got = ni.decode_resize_jpeg(buf.getvalue(), 64)
        assert got is not None and got.shape == (64, 64, 3)
        # libjpeg expands gray to identical RGB channels
        np.testing.assert_array_equal(got[..., 0], got[..., 1])

    def test_corrupt_bytes_return_none(self):
        _require_lib()
        assert ni.decode_resize_jpeg(b"\xff\xd8\xffnot a real jpeg", 64) is None

    def test_image_processor_fast_path_and_fallback(self, tmp_path):
        _require_lib()
        from pgica_tpu.data.preprocessing import ImageProcessor

        data = _jpeg(640, 480, seed=3)
        p = tmp_path / "img.jpg"
        p.write_bytes(data)
        fast = ImageProcessor(image_size=64, native_decode="fast",
                              device_side_normalization=True)
        exact = ImageProcessor(image_size=64, device_side_normalization=True)
        a = fast.process_image(p)
        b = exact.process_image(p)
        assert a.dtype == np.uint8 == b.dtype
        assert np.abs(a.astype(int) - b.astype(int)).mean() < 2.0

        # PNG is not handled natively -> PIL fallback, identical output
        png = tmp_path / "img.png"
        Image.open(io.BytesIO(data)).save(png)
        np.testing.assert_array_equal(fast.process_image(png), exact.process_image(png))
