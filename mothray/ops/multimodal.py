"""Multimodal column plumbing: image/audio/video as opaque binary
columns with typed metadata, processed by actor-pool map_batches
stages.

The decode kernels themselves are STUBBED (no image/audio libraries in
this container — task brief): `DeterministicFakeImageDecoder` parses a
tiny synthetic header format so the Ray-side plumbing — schema, batch
sizing, actor signature, output layout — is real and tested. Swapping
in PIL/libsndfile later only replaces `_decode_payload`.

Fake payload format (produced by make_fake_image): b"FAKE" + width u16
LE + height u16 LE + raw pixel bytes (w*h, grayscale).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

MAGIC = b"FAKE"


def make_fake_image(width: int, height: int, seed: int) -> bytes:
    rng = np.random.default_rng(seed)
    pix = rng.integers(0, 256, width * height, dtype=np.int64).astype(np.uint8)
    return MAGIC + int(width).to_bytes(2, "little") + int(height).to_bytes(2, "little") + pix.tobytes()


class ImageDecoder:
    """Actor-pool stage: binary image column -> width/height/mean_pixel
    metadata + decoded thumbnail. Heavy setup (real codecs, models)
    belongs in __init__ — once per actor, not per batch."""

    def __init__(self, thumbnail: int = 8):
        self.thumbnail = thumbnail
        try:  # real decoder if ever available
            import PIL.Image  # noqa: F401

            self._backend = "pil"
        except ImportError:
            self._backend = "fake"

    def _decode_payload(self, payload: bytes) -> np.ndarray | None:
        if payload is None or len(payload) < 8 or payload[:4] != MAGIC:
            if self._backend == "pil":
                raise NotImplementedError("real image decode not wired in this sandbox")
            return None
        w = int.from_bytes(payload[4:6], "little")
        h = int.from_bytes(payload[6:8], "little")
        pix = np.frombuffer(payload, dtype=np.uint8, count=w * h, offset=8)
        return pix.reshape(h, w)

    def __call__(self, batch: pa.Table) -> pa.Table:
        images = batch.column("image").to_pylist()
        widths, heights, means, thumbs = [], [], [], []
        for payload in images:
            img = self._decode_payload(payload)
            if img is None:
                widths.append(None)
                heights.append(None)
                means.append(None)
                thumbs.append(None)
                continue
            h, w = img.shape
            widths.append(w)
            heights.append(h)
            means.append(float(img.mean()))
            t = self.thumbnail
            ys = (np.arange(t) * h) // t
            xs = (np.arange(t) * w) // t
            thumbs.append(img[np.ix_(ys, xs)].tobytes())
        out = batch.append_column("width", pa.array(widths, type=pa.int32()))
        out = out.append_column("height", pa.array(heights, type=pa.int32()))
        out = out.append_column("mean_pixel", pa.array(means, type=pa.float64()))
        out = out.append_column("thumbnail", pa.array(thumbs, type=pa.binary()))
        return out


def decode_images(ds, concurrency: int = 4, batch_size: int = 256):
    """Actor pool sized for binary payloads: small batches so
    batch_size x payload x concurrency fits worker heaps (ray guide,
    memory-aware rule)."""
    return ds.map_batches(
        ImageDecoder,
        batch_format="pyarrow",
        concurrency=concurrency,
        batch_size=batch_size,
        num_cpus=1,
    )
