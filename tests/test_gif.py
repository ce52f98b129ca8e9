"""GIF decoder: make_gif round-trip, true LZW dictionary growth +
KwKwK self-reference, interlace reorder, extension skip, hostile
inputs."""

import numpy as np
import pyarrow as pa
import pytest

from mothray.ops import multimodal


def test_gif_roundtrip_make_parse():
    rng = np.random.default_rng(4)
    for _ in range(12):
        h, w = int(rng.integers(1, 48)), int(rng.integers(1, 48))
        gray = rng.integers(0, 256, (h, w), dtype=np.int64).astype(np.uint8)
        got = multimodal._parse_gif(memoryview(multimodal.make_gif(gray)))
        assert np.array_equal(got, gray)
    # big enough to span several 255-byte sub-blocks and CLEAR cycles
    gray = rng.integers(0, 256, (64, 64), dtype=np.int64).astype(np.uint8)
    assert np.array_equal(
        multimodal._parse_gif(memoryview(multimodal.make_gif(gray))), gray
    )


def test_gif_lzw_kwkwk_and_dict_growth():
    """Hand-packed stream at mcs=2: codes [CLEAR, 1, 6, 1, END] where 6
    == next_code exercises the KwKwK case; decodes to pixels
    [1,1,1,1]."""
    codes = [4, 1, 6, 1, 5]
    width = 3
    buf = nbits = 0
    stream = bytearray()
    for c in codes:
        buf |= c << nbits
        nbits += width
        while nbits >= 8:
            stream.append(buf & 0xFF)
            buf >>= 8
            nbits -= 8
    if nbits:
        stream.append(buf & 0xFF)
    out = multimodal._lzw_gif_decode(bytes(stream), 2, 4)
    assert out == b"\x01\x01\x01\x01"
    # real dictionary growth: abababab... compresses through dict hits
    src = bytes([0, 1] * 40)
    # encode with a real LZW encoder written here for the test
    clear, end = 4, 5
    dict_ = {bytes([i]): i for i in range(4)}
    next_code = 6
    w = 3
    seq = b""
    cds = [clear]
    widths = [3]
    for byte in src:
        cand = seq + bytes([byte])
        if cand in dict_:
            seq = cand
            continue
        cds.append(dict_[seq])
        widths.append(w)
        dict_[cand] = next_code
        next_code += 1
        if next_code - 1 == (1 << w) and w < 12:
            # decoder widens when ITS next_code hits 2^w; encoder must
            # widen one step later (after emitting at the old width)
            w += 1
        seq = bytes([byte])
    cds.append(dict_[seq])
    widths.append(w)
    cds.append(end)
    widths.append(w)
    buf = nbits = 0
    stream = bytearray()
    for c, cw in zip(cds, widths):
        buf |= c << nbits
        nbits += cw
        while nbits >= 8:
            stream.append(buf & 0xFF)
            buf >>= 8
            nbits -= 8
    if nbits:
        stream.append(buf & 0xFF)
    out = multimodal._lzw_gif_decode(bytes(stream), 2, len(src))
    assert out == src


def test_gif_interlaced_and_extensions():
    gray = np.arange(8 * 4, dtype=np.uint8).reshape(8, 4) * 3
    plain = multimodal.make_gif(gray)
    # rewrite as interlaced: rows permuted to pass order, flag 0x40
    order = np.concatenate(
        [np.arange(0, 8, 8), np.arange(4, 8, 8), np.arange(2, 8, 4), np.arange(1, 8, 2)]
    )
    inter = multimodal.make_gif(gray[order])
    # splice: copy interlaced pixel data but set the interlace flag
    di = bytearray(inter)
    desc_off = 13 + 768  # header + GCT
    assert di[desc_off] == 0x2C
    di[desc_off + 9] |= 0x40
    # prepend a graphic-control extension after the GCT
    ext = bytes([0x21, 0xF9, 4, 0, 0, 0, 0, 0])
    spliced = bytes(di[:desc_off]) + ext + bytes(di[desc_off:])
    got = multimodal._parse_gif(memoryview(spliced))
    assert np.array_equal(got, gray)


def test_gif_hostile_inputs():
    for junk in (
        b"",
        b"GIF89a",
        b"GIF89a" + bytes(20),
        multimodal.make_gif(np.zeros((4, 4), np.uint8))[:-10],
        b"GIF88a" + bytes(20),
    ):
        got = multimodal._parse_gif(memoryview(junk))
        assert got is None or isinstance(got, np.ndarray)


def test_gif_through_actor_pool(ray_session):
    import ray.data

    rng = np.random.default_rng(2)
    gray = rng.integers(0, 256, (10, 14), dtype=np.int64).astype(np.uint8)
    t = pa.table(
        {
            "img_id": pa.array([0, 1], pa.int64()),
            "image": pa.array(
                [multimodal.make_gif(gray), multimodal.make_png(gray)], pa.binary()
            ),
        }
    )
    dec = (
        multimodal.decode_images(ray.data.from_arrow(t), concurrency=2, batch_size=1)
        .to_pandas()
        .sort_values("img_id")
        .reset_index(drop=True)
    )
    assert dec.loc[0, "width"] == 14 and dec.loc[0, "height"] == 10
    assert dec.loc[0, "mean_pixel"] == pytest.approx(gray.mean())
    assert dec.loc[0, "mean_pixel"] == pytest.approx(dec.loc[1, "mean_pixel"])
