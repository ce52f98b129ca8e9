"""Native media-library routing (r5): ImageDecoder selects PIL when the
import probe succeeds, falls back to the stdlib kernels otherwise. PIL
is absent in this container, so the native path is exercised through a
stubbed module — the flip is pre-wired and zero-risk the day the
container gains the library."""

import sys
import types

import numpy as np
import pyarrow as pa

from mothray.ops import multimodal


def _bmp_payload():
    """A tiny real grayscale BMP via the repo's own test helper path:
    8x8 gradient, written with the minimal BMP writer the multimodal
    tests use."""
    w = h = 8
    pix = (np.arange(w * h, dtype=np.uint8)).reshape(h, w)
    # minimal 8-bit BMP with grayscale palette (bottom-up rows, padded)
    row = ((w + 3) // 4) * 4
    header_size = 14 + 40 + 256 * 4
    size = header_size + row * h
    out = bytearray()
    out += b"BM" + size.to_bytes(4, "little") + b"\0\0\0\0"
    out += header_size.to_bytes(4, "little")
    out += (40).to_bytes(4, "little")
    out += w.to_bytes(4, "little") + h.to_bytes(4, "little")
    out += (1).to_bytes(2, "little") + (8).to_bytes(2, "little")
    out += (0).to_bytes(4, "little") + (row * h).to_bytes(4, "little")
    out += b"\0" * 16
    for i in range(256):
        out += bytes([i, i, i, 0])
    for y in range(h - 1, -1, -1):
        out += pix[y].tobytes() + b"\0" * (row - w)
    return bytes(out), pix


def test_stdlib_path_decodes_bmp():
    dec = multimodal.ImageDecoder()
    assert dec._backend == "builtin"  # PIL absent in this container
    payload, pix = _bmp_payload()
    img = dec._decode_payload(memoryview(payload))
    assert img is not None and img.shape == (8, 8)
    assert np.array_equal(img, pix)


def test_native_backend_selected_and_used(monkeypatch):
    """With an importable PIL, the decoder must (a) report the pil
    backend and (b) route real-format payloads through it BEFORE the
    stdlib kernels."""
    sentinel = np.full((4, 4), 7, dtype=np.uint8)
    opened = []

    class FakeImg:
        def convert(self, mode):
            assert mode == "L"
            return sentinel

        def __enter__(self):
            return self

        def __exit__(self, *a):
            return False

    def fake_open(buf):
        opened.append(len(buf.getvalue()))
        return FakeImg()

    pil = types.ModuleType("PIL")
    pil_image = types.ModuleType("PIL.Image")
    pil_image.open = fake_open
    pil.Image = pil_image
    monkeypatch.setitem(sys.modules, "PIL", pil)
    monkeypatch.setitem(sys.modules, "PIL.Image", pil_image)

    dec = multimodal.ImageDecoder()
    assert dec._backend == "pil"
    payload, _ = _bmp_payload()
    img = dec._decode_payload(memoryview(payload))
    assert opened, "native lib was probed but never used"
    assert np.array_equal(img, sentinel)


def test_native_failure_falls_back_to_stdlib(monkeypatch):
    """A payload the native lib rejects still decodes via the stdlib
    kernels (hermetic parity preserved)."""

    pil = types.ModuleType("PIL")
    pil_image = types.ModuleType("PIL.Image")

    def refuse(buf):
        raise OSError("cannot identify image file")

    pil_image.open = refuse
    pil.Image = pil_image
    monkeypatch.setitem(sys.modules, "PIL", pil)
    monkeypatch.setitem(sys.modules, "PIL.Image", pil_image)

    dec = multimodal.ImageDecoder()
    assert dec._backend == "pil"
    payload, pix = _bmp_payload()
    img = dec._decode_payload(memoryview(payload))
    assert img is not None and np.array_equal(img, pix)


def test_synthetic_container_never_hits_native(monkeypatch):
    """The sandbox's synthetic MAGIC container decodes inline even when
    a native lib is present (it is not a real format)."""

    def explode(buf):
        raise AssertionError("native lib called for synthetic payload")

    pil = types.ModuleType("PIL")
    pil_image = types.ModuleType("PIL.Image")
    pil_image.open = explode
    pil.Image = pil_image
    monkeypatch.setitem(sys.modules, "PIL", pil)
    monkeypatch.setitem(sys.modules, "PIL.Image", pil_image)

    dec = multimodal.ImageDecoder()
    pix = np.arange(16, dtype=np.uint8).reshape(4, 4)
    payload = multimodal.MAGIC + (4).to_bytes(2, "little") + (4).to_bytes(2, "little") + pix.tobytes()
    img = dec._decode_payload(memoryview(payload))
    assert np.array_equal(img, pix)
