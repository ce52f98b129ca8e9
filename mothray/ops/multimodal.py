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


def _binary_views(col) -> list:
    """Per-row ZERO-COPY memoryviews of a binary column: offset-sliced
    views over the shared values buffer — payload bytes are never
    copied into Python objects (r2 VERDICT item 5; the former per-row
    python conversion copied every payload). None for null rows.
    Handles sliced arrays (parent offset) and large_binary."""
    arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    n = len(arr)
    if n == 0 or arr.null_count == n:
        return [None] * n
    bufs = arr.buffers()
    dt = np.int64 if pa.types.is_large_binary(arr.type) else np.int32
    offs = np.frombuffer(bufs[1], dtype=dt)[arr.offset : arr.offset + n + 1]
    data = memoryview(bufs[2]).cast("B")
    nulls = arr.is_null().to_numpy(zero_copy_only=False) if arr.null_count else None
    return [
        None if (nulls is not None and nulls[i]) else data[offs[i] : offs[i + 1]]
        for i in range(n)
    ]


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

    def _decode_payload(self, payload) -> np.ndarray | None:
        # payload is a zero-copy memoryview slice (see _binary_views)
        if payload is None or len(payload) < 8 or payload[:4] != MAGIC:
            if self._backend == "pil":
                raise NotImplementedError("real image decode not wired in this sandbox")
            return None
        w = int.from_bytes(payload[4:6], "little")
        h = int.from_bytes(payload[6:8], "little")
        pix = np.frombuffer(payload, dtype=np.uint8, count=w * h, offset=8)
        return pix.reshape(h, w)

    def __call__(self, batch: pa.Table) -> pa.Table:
        images = _binary_views(batch.column("image"))
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


AUDIO_MAGIC = b"FAKA"
VIDEO_MAGIC = b"FAKV"


def make_fake_audio(n_samples: int, rate: int, seed: int) -> bytes:
    rng = np.random.default_rng(seed)
    pcm = rng.integers(-32768, 32768, n_samples, dtype=np.int64).astype("<i2")
    return AUDIO_MAGIC + int(rate).to_bytes(4, "little") + pcm.tobytes()


def make_fake_video(n_frames: int, w: int, h: int, seed: int) -> bytes:
    rng = np.random.default_rng(seed)
    frames = rng.integers(0, 256, n_frames * w * h, dtype=np.int64).astype(np.uint8)
    hdr = VIDEO_MAGIC + int(n_frames).to_bytes(2, "little") + int(w).to_bytes(2, "little") + int(h).to_bytes(2, "little")
    return hdr + frames.tobytes()


class AudioFeatures:
    """Actor-pool stage: audio binary -> (duration_sec, rms) metadata.
    Real decoders (libsndfile etc.) are absent in this container; the
    FAKA payload keeps the plumbing (schema/batching/actor) real."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        durs, rms = [], []
        for payload in _binary_views(batch.column("audio")):
            if payload is None or payload[:4] != AUDIO_MAGIC:
                durs.append(None)
                rms.append(None)
                continue
            rate = int.from_bytes(payload[4:8], "little")
            pcm = np.frombuffer(payload, dtype="<i2", offset=8)
            durs.append(len(pcm) / max(rate, 1))
            rms.append(float(np.sqrt(np.mean(pcm.astype(np.float64) ** 2))))
        return batch.append_column("duration_sec", pa.array(durs, type=pa.float64())).append_column(
            "rms", pa.array(rms, type=pa.float64())
        )


class VideoFrameSampler:
    """Actor-pool stage: video binary -> every k-th frame as thumbnails
    (list<binary>); stubbed decoder, real batching/memory layout."""

    def __init__(self, every: int = 2):
        self.every = every

    def __call__(self, batch: pa.Table) -> pa.Table:
        sampled = []
        for payload in _binary_views(batch.column("video")):
            if payload is None or payload[:4] != VIDEO_MAGIC:
                sampled.append(None)
                continue
            nf = int.from_bytes(payload[4:6], "little")
            w = int.from_bytes(payload[6:8], "little")
            h = int.from_bytes(payload[8:10], "little")
            frames = np.frombuffer(payload, dtype=np.uint8, offset=10).reshape(nf, h, w)
            sampled.append([frames[i].tobytes() for i in range(0, nf, self.every)])
        return batch.append_column("sampled_frames", pa.array(sampled, type=pa.list_(pa.binary())))


def audio_features(ds, concurrency: int = 4, batch_size: int = 256):
    return ds.map_batches(AudioFeatures, batch_format="pyarrow", concurrency=concurrency, batch_size=batch_size)


def sample_video_frames(ds, every: int = 2, concurrency: int = 4, batch_size: int = 64):
    return ds.map_batches(
        VideoFrameSampler,
        fn_constructor_kwargs={"every": every},
        batch_format="pyarrow",
        concurrency=concurrency,
        batch_size=batch_size,  # video payloads are large: small batches
    )


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


class ImageResizer:
    """Actor-pool stage: resize every image to (target_w, target_h)
    with nearest-neighbor sampling, emitting the SAME container format
    so the output composes with ImageDecoder (resize -> decode ->
    features chains). The sampling math is real; only the container is
    the sandbox's synthetic format (no image libs here) — with PIL
    present the payload branch would swap, the Ray plumbing would not
    change. Undecodable/null rows pass through as null."""

    def __init__(self, target_w: int = 32, target_h: int = 32):
        self.tw, self.th = int(target_w), int(target_h)
        self._dec = ImageDecoder()

    def __call__(self, batch: pa.Table) -> pa.Table:
        images = _binary_views(batch.column("image"))
        out = []
        header = MAGIC + self.tw.to_bytes(2, "little") + self.th.to_bytes(2, "little")
        for payload in images:
            img = self._dec._decode_payload(payload)
            if img is None:
                out.append(None)
                continue
            h, w = img.shape
            ys = (np.arange(self.th) * h) // self.th
            xs = (np.arange(self.tw) * w) // self.tw
            out.append(header + img[np.ix_(ys, xs)].tobytes())
        return batch.set_column(
            batch.column_names.index("image"), "image", pa.array(out, type=pa.binary())
        )


def resize_images(ds, target_w: int = 32, target_h: int = 32, concurrency: int = 4, batch_size: int = 256):
    """Payload-aware batch size: binary images are MB-scale, so batches
    stay small enough that batch x concurrency fits a worker heap."""
    return ds.map_batches(
        ImageResizer,
        fn_constructor_kwargs={"target_w": target_w, "target_h": target_h},
        batch_format="pyarrow",
        concurrency=concurrency,
        batch_size=batch_size,
        num_cpus=1,
    )
