"""PNG decoder tests: round-trip through make_png, reconstruction of
all five scanline filters against a straight-from-spec reference
encoder, every supported color type, and hostile inputs."""
import struct
import zlib

import numpy as np
import pyarrow as pa
import pytest

from mothray.ops import multimodal


def _chunk(typ: bytes, body: bytes) -> bytes:
    return (
        struct.pack(">I", len(body)) + typ + body
        + struct.pack(">I", zlib.crc32(typ + body) & 0xFFFFFFFF)
    )


def _png(w, h, ctype, scanlines: bytes, palette: bytes | None = None) -> bytes:
    out = multimodal._PNG_SIG + _chunk(
        b"IHDR", struct.pack(">IIBBBBB", w, h, 8, ctype, 0, 0, 0)
    )
    if palette is not None:
        out += _chunk(b"PLTE", palette)
    return out + _chunk(b"IDAT", zlib.compress(scanlines)) + _chunk(b"IEND", b"")


def _filter_rows(img: np.ndarray, bpp: int, filt_of_row) -> bytes:
    """Reference filter encoder, transcribed from the PNG spec: for each
    row emit the filter byte then filt(x) computed from ORIGINAL bytes
    (the spec filters on raw values; reconstruction inverts them)."""
    h = img.shape[0]
    flat = img.reshape(h, -1).astype(np.int32)
    out = bytearray()
    for r in range(h):
        f = filt_of_row(r)
        out.append(f)
        row, prev = flat[r], (flat[r - 1] if r else np.zeros_like(flat[r]))
        for x in range(flat.shape[1]):
            a = row[x - bpp] if x >= bpp else 0
            b = prev[x]
            c = prev[x - bpp] if x >= bpp else 0
            if f == 0:
                v = row[x]
            elif f == 1:
                v = row[x] - a
            elif f == 2:
                v = row[x] - b
            elif f == 3:
                v = row[x] - ((a + b) >> 1)
            else:
                p = a + b - c
                pa_, pb, pc_ = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa_ <= pb and pa_ <= pc_) else (b if pb <= pc_ else c)
                v = row[x] - pred
            out.append(v & 0xFF)
    return bytes(out)


def test_png_roundtrip_make_parse():
    rng = np.random.default_rng(7)
    for _ in range(20):
        h, w = int(rng.integers(1, 40)), int(rng.integers(1, 40))
        gray = rng.integers(0, 256, (h, w), dtype=np.int64).astype(np.uint8)
        assert np.array_equal(
            multimodal._parse_png(memoryview(multimodal.make_png(gray))), gray
        )


@pytest.mark.parametrize("filt", [0, 1, 2, 3, 4])
def test_png_single_filter_reconstruction(filt):
    rng = np.random.default_rng(100 + filt)
    gray = rng.integers(0, 256, (9, 13), dtype=np.int64).astype(np.uint8)
    payload = _png(13, 9, 0, _filter_rows(gray[..., None], 1, lambda r: filt))
    assert np.array_equal(multimodal._parse_png(memoryview(payload)), gray)


def test_png_mixed_filters_and_rgb_luma():
    rng = np.random.default_rng(42)
    rgb = rng.integers(0, 256, (11, 7, 3), dtype=np.int64).astype(np.uint8)
    payload = _png(7, 11, 2, _filter_rows(rgb, 3, lambda r: r % 5))
    got = multimodal._parse_png(memoryview(payload))
    want = (
        rgb[..., 0].astype(np.uint32) * 299
        + rgb[..., 1].astype(np.uint32) * 587
        + rgb[..., 2].astype(np.uint32) * 114
    ) // 1000
    assert np.array_equal(got, want.astype(np.uint8))


def test_png_palette_gray_alpha_rgba():
    rng = np.random.default_rng(3)
    # palette: indices map through PLTE then to luma
    idx = rng.integers(0, 16, (5, 6), dtype=np.int64).astype(np.uint8)
    pal = rng.integers(0, 256, (16, 3), dtype=np.int64).astype(np.uint8)
    p = _png(6, 5, 3, _filter_rows(idx[..., None], 1, lambda r: (r * 2) % 5),
             palette=pal.tobytes())
    want = (
        pal[idx][..., 0].astype(np.uint32) * 299
        + pal[idx][..., 1].astype(np.uint32) * 587
        + pal[idx][..., 2].astype(np.uint32) * 114
    ) // 1000
    assert np.array_equal(multimodal._parse_png(memoryview(p)), want.astype(np.uint8))
    # gray+alpha: gray channel survives, alpha ignored
    ga = rng.integers(0, 256, (4, 3, 2), dtype=np.int64).astype(np.uint8)
    p = _png(3, 4, 4, _filter_rows(ga, 2, lambda r: 4))
    assert np.array_equal(multimodal._parse_png(memoryview(p)), ga[..., 0])
    # RGBA: luma of RGB, alpha dropped
    rgba = rng.integers(0, 256, (4, 5, 4), dtype=np.int64).astype(np.uint8)
    p = _png(5, 4, 6, _filter_rows(rgba, 4, lambda r: 3))
    want = (
        rgba[..., 0].astype(np.uint32) * 299
        + rgba[..., 1].astype(np.uint32) * 587
        + rgba[..., 2].astype(np.uint32) * 114
    ) // 1000
    assert np.array_equal(multimodal._parse_png(memoryview(p)), want.astype(np.uint8))


def test_png_multi_idat_and_hostile():
    gray = np.arange(48, dtype=np.uint8).reshape(6, 8)
    full = multimodal.make_png(gray)
    # split the IDAT into two chunks: decoders must concatenate before inflate
    comp = zlib.compress(_filter_rows(gray[..., None], 1, lambda r: 0))
    two = (
        multimodal._PNG_SIG
        + _chunk(b"IHDR", struct.pack(">IIBBBBB", 8, 6, 8, 0, 0, 0, 0))
        + _chunk(b"IDAT", comp[:7])
        + _chunk(b"IDAT", comp[7:])
        + _chunk(b"IEND", b"")
    )
    assert np.array_equal(multimodal._parse_png(memoryview(two)), gray)
    for junk in (
        b"",
        b"\x89PNGblocked",
        multimodal._PNG_SIG,  # signature only
        full[:-20],  # truncated: missing tail of IDAT+IEND still decodes or None, never raises
        full[:40],
        multimodal._PNG_SIG + _chunk(b"IHDR", struct.pack(">IIBBBBB", 4, 4, 16, 0, 0, 0, 0)),
        multimodal._PNG_SIG + _chunk(b"IHDR", struct.pack(">IIBBBBB", 4, 4, 8, 3, 0, 0, 0)),
    ):
        got = multimodal._parse_png(memoryview(bytes(junk)))
        assert got is None or isinstance(got, np.ndarray)
    # interlaced -> unsupported, None
    inter = multimodal._PNG_SIG + _chunk(
        b"IHDR", struct.pack(">IIBBBBB", 4, 4, 8, 0, 0, 0, 1)
    ) + _chunk(b"IDAT", zlib.compress(bytes(20))) + _chunk(b"IEND", b"")
    assert multimodal._parse_png(memoryview(inter)) is None


def test_png_through_actor_pool_stage(ray_session):
    import ray.data

    rng = np.random.default_rng(11)
    gray = rng.integers(0, 256, (12, 16), dtype=np.int64).astype(np.uint8)
    imgs = [
        multimodal.make_png(gray),
        multimodal.make_bmp(gray),
        b"\x89PNG\r\n\x1a\n truncated",
    ]
    t = pa.table({"img_id": pa.array(range(3), pa.int64()),
                  "image": pa.array(imgs, pa.binary())})
    dec = (
        multimodal.decode_images(ray.data.from_arrow(t), concurrency=2, batch_size=2)
        .to_pandas().sort_values("img_id").reset_index(drop=True)
    )
    assert dec.loc[0, "width"] == 16 and dec.loc[0, "height"] == 12
    assert np.isclose(dec.loc[0, "mean_pixel"], gray.mean())
    assert np.isclose(dec.loc[0, "mean_pixel"], dec.loc[1, "mean_pixel"])
    assert np.isnan(dec.loc[2, "mean_pixel"])
