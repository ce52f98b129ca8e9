"""Perceptual image dedup: dHash-64 properties (brightness invariance,
area-mean resize correctness, shift tolerance) and the end-to-end
band+verify+anti-join path over real BMP payloads."""

import numpy as np
import pyarrow as pa
import pytest

from mothray.ops import multimodal


def _ham(a: int, b: int) -> int:
    return bin((a ^ b) & ((1 << 64) - 1)).count("1")


def test_dhash_gradients_and_uniform():
    # horizontal ramp: every right block is brighter -> all 64 bits set
    ramp = np.tile(np.arange(90, dtype=np.uint8) * 2, (40, 1))
    assert multimodal.dhash64(ramp) == (1 << 64) - 1
    # vertical ramp: no horizontal gradient -> all bits clear
    vramp = np.tile((np.arange(40, dtype=np.uint8) * 3)[:, None], (1, 90))
    assert multimodal.dhash64(vramp) == 0
    # uniform: all equal means, strict > -> 0
    assert multimodal.dhash64(np.full((20, 20), 7, np.uint8)) == 0
    # too small
    assert multimodal.dhash64(np.full((5, 5), 7, np.uint8)) is None


def test_dhash_brightness_invariance_and_noise():
    rng = np.random.default_rng(6)
    img = rng.integers(0, 200, (64, 64)).astype(np.uint8)
    h0 = multimodal.dhash64(img)
    assert h0 == multimodal.dhash64(np.clip(img.astype(np.int32) + 40, 0, 255).astype(np.uint8))
    # a few flipped pixels barely move the hash
    noisy = img.copy()
    noisy[10, 10] ^= 0xFF
    noisy[40, 50] ^= 0xFF
    assert _ham(h0, multimodal.dhash64(noisy)) <= 3
    # a different random image is far away
    other = rng.integers(0, 200, (64, 64)).astype(np.uint8)
    assert _ham(h0, multimodal.dhash64(other)) > 10


def test_dhash_area_mean_not_sampling():
    """A bright stripe BETWEEN nearest-neighbor sample points must
    still influence the hash (area mean sees every pixel)."""
    img = np.zeros((80, 90), np.uint8)
    img[:, 12] = 255  # one bright column inside block c=1
    h = multimodal.dhash64(img)
    # block (r, 1) brighter than block (r, 0) -> bit c=1... wait:
    # bit[c] compares block[c+1] > block[c]; stripe in block 1 sets
    # bit 0 (block1 > block0) and clears bit 1 (block2 < block1)
    bits = np.unpackbits(np.frombuffer(np.uint64(h).tobytes(), np.uint8)[::-1])[::-1]
    # row-major bit index r*8 + c
    for r in range(8):
        assert bits[63 - (r * 8 + 0)] == 1  # numpy packbits MSB-first
    assert h != 0


def _image_table(n=40):
    ids = np.arange(n, dtype=np.int64)
    imgs = []
    for i in ids:
        if i % 11 == 10:
            imgs.append(b"nope")  # undecodable: always kept
            continue
        if i % 2 == 0:  # horizontal ramp family: all hamming-0 dups
            base = np.tile(np.arange(90, dtype=np.uint8) * 2, (40, 1))
            img = np.clip(base.astype(np.int32) + int(i) % 30, 0, 255).astype(np.uint8)
        else:  # vertical ramp family
            base = np.tile((np.arange(40, dtype=np.uint8) * 3)[:, None], (1, 90))
            img = np.clip(base.astype(np.int32) + int(i) % 30, 0, 255).astype(np.uint8)
        imgs.append(multimodal.make_bmp(img))
    return pa.table({"image_id": pa.array(ids), "image": pa.array(imgs, pa.binary())})


def test_perceptual_dedup_end_to_end(ray_session):
    import ray.data

    t = _image_table()
    ds = ray.data.from_arrow(t).repartition(3)
    kept = multimodal.perceptual_dedup(ds, "image", "image_id", concurrency=2).to_pandas()
    kept_ids = sorted(kept["image_id"].tolist())
    undecodable = [i for i in range(40) if i % 11 == 10]
    # min id of each ramp family + all undecodables survive
    assert kept_ids == sorted({0, 1} | set(undecodable))


def test_perceptual_dedup_hamming_guard(ray_session):
    import ray.data

    ds = ray.data.from_arrow(_image_table(4))
    with pytest.raises(Exception, match="max_hamming"):
        multimodal.perceptual_dedup(ds, "image", "image_id", max_hamming=9).materialize()
