"""Byte-level RLE (ORC byte RLE), used for int8 columns and as the
underlayer of the boolean bit-packed stream.

Format (reference: pkg/store/ByteOutputStream.go:42-83,
pkg/store/ByteInputStream.go): a run of >=3 equal bytes (max 130) is
`(count - 3) :: uint8 in 0..127` followed by the value byte; a literal
group of 1..128 bytes is `(-n) :: int8` followed by the n bytes.

Run detection is vectorized (np.diff boundaries); only the emit loop
iterates, over runs/groups — O(#segments), not O(n).
"""

from __future__ import annotations

import numpy as np

_MIN_RUN = 3
_MAX_RUN = 130
_MAX_LITERALS = 128


def encode(values: np.ndarray) -> bytes:
    v = np.ascontiguousarray(values, dtype=np.uint8)
    n = len(v)
    if n == 0:
        return b""
    # run-length segmentation
    boundaries = np.nonzero(np.diff(v))[0] + 1
    starts = np.concatenate(([0], boundaries))
    lengths = np.diff(np.concatenate((starts, [n])))
    out = bytearray()
    lit_start = -1  # start of pending literal region (in value index space)
    lit_len = 0

    def flush_literals(end: int) -> None:
        nonlocal lit_start, lit_len
        if lit_len == 0:
            return
        pos = lit_start
        while lit_len > 0:
            take = min(lit_len, _MAX_LITERALS)
            out.append((256 - take) & 0xFF)  # -take as int8
            out.extend(v[pos : pos + take].tobytes())
            pos += take
            lit_len -= take
        lit_start = -1

    for s, length in zip(starts.tolist(), lengths.tolist()):
        if length >= _MIN_RUN:
            flush_literals(s)
            rem = length
            p = s
            while rem >= _MIN_RUN:
                take = min(rem, _MAX_RUN)
                out.append(take - _MIN_RUN)
                out.append(int(v[p]))
                p += take
                rem -= take
            if rem:  # 1-2 leftover -> literals
                if lit_len == 0:
                    lit_start = p
                lit_len += rem
        else:
            if lit_len == 0:
                lit_start = s
            lit_len += length
    flush_literals(n)
    return bytes(out)


def decode(data, count: int, offset: int = 0):
    """Returns (uint8 array of `count` values, bytes consumed)."""
    b = np.frombuffer(data, dtype=np.uint8) if isinstance(data, (bytes, bytearray, memoryview)) else data
    pos = offset
    out = np.empty(count, dtype=np.uint8)
    filled = 0
    while filled < count:
        ctrl = int(b[pos])
        pos += 1
        if ctrl < 128:  # run
            run = ctrl + _MIN_RUN
            out[filled : filled + run] = b[pos]
            pos += 1
            filled += run
        else:  # literals
            nlit = 256 - ctrl
            out[filled : filled + nlit] = b[pos : pos + nlit]
            pos += nlit
            filled += nlit
    if filled != count:
        raise ValueError("byte RLE stream misaligned")
    return out, pos - offset
