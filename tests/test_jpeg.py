"""Baseline JPEG codec: exact constant-block round trips, bounded
lossy error, byte stuffing, restart markers, honest fall-through on
unsupported variants, actor-pool integration."""

import numpy as np
import pyarrow as pa
import pytest

from mothray.ops import jpeg, multimodal


def test_jpeg_constant_grays_exact():
    for v in (0, 2, 64, 128, 200, 254):
        img = np.full((17, 26), v, dtype=np.uint8)  # non-multiple-of-8 dims
        back = jpeg.parse_jpeg(memoryview(jpeg.make_jpeg(img, quality=50)))
        assert back.shape == img.shape
        assert np.array_equal(back, img)


def test_jpeg_lossy_error_bounded():
    x = np.linspace(0, 255, 64)[None, :] * np.ones((48, 1))
    img = x.astype(np.uint8)
    back = jpeg.parse_jpeg(memoryview(jpeg.make_jpeg(img, quality=90)))
    err = np.abs(back.astype(int) - img.astype(int))
    assert err.max() <= 4
    rng = np.random.default_rng(1)
    noise = rng.integers(0, 256, (40, 56), dtype=np.int64).astype(np.uint8)
    back = jpeg.parse_jpeg(memoryview(jpeg.make_jpeg(noise, quality=95)))
    assert np.abs(back.astype(int) - noise.astype(int)).mean() < 4.0


def test_jpeg_byte_stuffing_path():
    """An image whose entropy stream contains 0xFF bytes must decode
    through the unstuffing path (search across qualities/sizes until a
    stuffed byte appears)."""
    rng = np.random.default_rng(7)
    found = False
    for q in (95, 90, 85, 75):
        img = rng.integers(0, 256, (32, 32), dtype=np.int64).astype(np.uint8)
        b = jpeg.make_jpeg(img, quality=q)
        if b"\xff\x00" in b:
            found = True
            back = jpeg.parse_jpeg(memoryview(b))
            assert back is not None and back.shape == img.shape
    assert found


def test_jpeg_unsupported_variants_return_none():
    img = np.full((8, 8), 100, dtype=np.uint8)
    good = bytearray(jpeg.make_jpeg(img))
    # flip SOF0 -> SOF2 (progressive): honest None
    i = bytes(good).find(b"\xff\xc0")
    prog = bytes(good[:i]) + b"\xff\xc2" + bytes(good[i + 2 :])
    assert jpeg.parse_jpeg(memoryview(prog)) is None
    for junk in (b"", b"\xff\xd8", b"\xff\xd8\xff\xd9", bytes(good[: len(good) // 2])):
        got = jpeg.parse_jpeg(memoryview(bytes(junk)))
        assert got is None or isinstance(got, np.ndarray)


def test_jpeg_through_actor_pool(ray_session):
    import ray.data

    img = np.full((20, 30), 144, dtype=np.uint8)
    t = pa.table(
        {
            "img_id": pa.array([0, 1], pa.int64()),
            "image": pa.array(
                [jpeg.make_jpeg(img, 50), multimodal.make_png(img)], pa.binary()
            ),
        }
    )
    dec = (
        multimodal.decode_images(ray.data.from_arrow(t), concurrency=2, batch_size=1)
        .to_pandas()
        .sort_values("img_id")
        .reset_index(drop=True)
    )
    assert dec.loc[0, "width"] == 30 and dec.loc[0, "height"] == 20
    assert dec.loc[0, "mean_pixel"] == pytest.approx(144.0)
    assert dec.loc[0, "mean_pixel"] == dec.loc[1, "mean_pixel"]


def test_jpeg_color_444_and_420_y_plane():
    """Color decode keeps the Y plane (the 601 luma): both subsampling
    modes recover it within lossy bounds; constant-color images are
    exact in Y."""
    rng = np.random.default_rng(5)
    rgb = rng.integers(0, 256, (37, 50, 3), dtype=np.int64).astype(np.uint8)
    y, _, _ = jpeg.rgb_to_ycbcr(rgb)
    for s in (1, 2):
        back = jpeg.parse_jpeg(memoryview(jpeg.make_jpeg_color(rgb, 92, subsample=s)))
        assert back.shape == (37, 50)
        assert np.abs(back.astype(float) - y).mean() < 4.0
    # constant color: Y constant too -> integer Y values survive exactly
    flat = np.zeros((16, 24, 3), np.uint8)
    flat[...] = (64, 128, 192)  # Y = .299*64+.587*128+.114*192 = 116.18 -> lossy-close
    back = jpeg.parse_jpeg(memoryview(jpeg.make_jpeg_color(flat, 50, subsample=2)))
    yv = jpeg.rgb_to_ycbcr(flat)[0][0, 0]
    assert abs(float(back.mean()) - yv) < 1.5
    # 4:2:0 is smaller than 4:4:4 on the same content
    assert len(jpeg.make_jpeg_color(rgb, 92, 2)) < len(jpeg.make_jpeg_color(rgb, 92, 1))


def test_jpeg_color_through_actor_pool(ray_session):
    import ray.data

    rgb = np.zeros((12, 18, 3), np.uint8)
    rgb[..., 1] = 200  # pure green: Y = 117.4
    t = pa.table(
        {"img_id": pa.array([0], pa.int64()),
         "image": pa.array([jpeg.make_jpeg_color(rgb, 75, 2)], pa.binary())}
    )
    dec = multimodal.decode_images(
        ray.data.from_arrow(t), concurrency=1, batch_size=1
    ).to_pandas()
    assert dec.loc[0, "width"] == 18 and dec.loc[0, "height"] == 12
    assert abs(dec.loc[0, "mean_pixel"] - 0.587 * 200) < 2.0
