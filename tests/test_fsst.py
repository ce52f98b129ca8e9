"""FSST codec tests: round-trip, compression effectiveness on
prefix-heavy text (FIXTURES.md F3 shared_prefixes), passthrough on
incompressible data."""

import numpy as np
import pytest

from mothray.codecs import fsst

rng = np.random.default_rng(3)


def roundtrip(data: bytes):
    table, enc = fsst.compress(data)
    dec = fsst.decompress(table, enc, len(data))
    assert dec == data, f"mismatch: {data[:50]!r} vs {dec[:50]!r}"
    return table, enc


def test_empty_and_tiny():
    roundtrip(b"")
    roundtrip(b"a")
    roundtrip(b"hello world")


def test_repetitive_text_compresses():
    data = b"http://www.example.com/path/to/page?id=123&ref=abc " * 2000
    table, enc = roundtrip(data)
    assert table  # trained a real table
    assert len(enc) < len(data) / 3


def test_url_like_corpus():
    hosts = [f"https://web{i % 50}.example{i % 7}.com/articles/{i:07d}.html" for i in range(5000)]
    data = "".join(hosts).encode()
    table, enc = roundtrip(data)
    assert len(enc) + len(table) < len(data) / 2


def test_multilingual_text():
    words = "the quick brown fox данные слова 記事 内容 données mots".split()
    data = " ".join(words[rng.integers(0, len(words))] for _ in range(5000)).encode()
    table, enc = roundtrip(data)
    assert len(enc) < len(data)


def test_incompressible_passthrough():
    data = rng.integers(0, 256, 100_000).astype(np.uint8).tobytes()
    table, enc = fsst.compress(data)
    # random bytes: table may be empty (passthrough) or barely helpful
    assert fsst.decompress(table, enc, len(data)) == data


def test_all_escape_bytes():
    data = bytes([255] * 1000)
    roundtrip(data)


def test_escape_boundary_parity():
    # 0xFF symbols and literals interleaved, odd/even run lengths
    data = b"\xff" + b"ab" * 100 + b"\xff\xff" + b"cd" * 100 + b"\xff" * 3
    roundtrip(data)


def test_segment_concat_decodes():
    # many lanes: segments concatenated must decode as one stream
    data = (b"prefix-common-" * 500) + bytes(rng.integers(97, 123, 5000).astype(np.uint8))
    table, enc = fsst.compress(data)
    assert fsst.decompress(table, enc, len(data)) == data


@pytest.mark.parametrize("size", [100, 1000, 65537, 300_000])
def test_sizes(size):
    base = b"common web page text with the usual words and phrases "
    data = (base * (size // len(base) + 1))[:size]
    roundtrip(data)


def test_throughput_reasonable():
    import time

    base = ("the quick brown fox jumps over the lazy dog " * 10).encode()
    data = base * 3000  # ~1.3 MB
    table, _ = fsst.compress(data)
    t0 = time.monotonic()
    _, enc = fsst.compress(data)
    el = time.monotonic() - t0
    assert len(data) / el > 3e6, f"FSST encode too slow: {len(data)/el/1e6:.1f} MB/s"


def test_native_numpy_cross_compat():
    """C kernel and numpy lanes produce mutually decodable streams."""
    from mothray.codecs import _fsst_native

    data = (b"https://example.com/path/page-" * 3000) + bytes(rng.integers(32, 127, 20000).astype(np.uint8))
    buf = np.frombuffer(data, np.uint8)
    tab = fsst.train(buf)
    if not tab.symbols:
        pytest.skip("no table trained")
    enc_np, _, _ = fsst._encode_lanes(buf, tab, max(len(buf) // 1024, 1))
    assert fsst.decompress(tab.serialize(), enc_np, len(data)) == data
    if _fsst_native.get_lib() is not None:
        enc_c = fsst._native_encode(buf, tab)
        assert fsst.decompress(tab.serialize(), enc_c, len(data)) == data
        assert fsst._native_decode(enc_np, tab, len(data)) == data
