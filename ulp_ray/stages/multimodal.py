"""Multimodal columns: opaque ``binary`` payloads + typed metadata.

Images/audio/video are carried as ``binary`` columns with metadata
(``media_type``, ``width``/``height``/``duration_ms``); decode /
feature-extract / resize / frame-sample run as **actor-pool map_batches
stages** (state = the decoder, loaded once per actor in ``__init__``).

Codec status (honest accounting):

- **PPM (P6) decode is REAL** — a dependency-free numpy parser
  (``_decode_ppm``), exercised end-to-end in tests with real pixel
  payloads; the synthetic media table generates genuine P6 images.
- **PNG decode/encode is REAL** — a dependency-free stdlib-zlib codec
  (``encode_png`` / ``_decode_png``): non-interlaced 8-bit gray/RGB/RGBA,
  all five scanline filters, CRC-verified chunks. Round-tripped on real
  pixels in tests.
- JPEG/audio/video need PIL / libav, which this container lacks: those
  paths try the real import and otherwise fall back to a clearly-marked
  deterministic STUB (seeded from the payload hash). The Ray-side
  plumbing (schema, batch sizing for wide binary rows, actor signature,
  output layout) is identical either way. Replace ``_decode_stub`` with
  the real codec on a cluster image that has it.
"""

from __future__ import annotations

import hashlib
import struct
import zlib

import numpy as np
import pyarrow as pa

from .._env import remote_env

__all__ = [
    "encode_wav",
    "MEDIA_SCHEMA",
    "make_synthetic_media_table",
    "encode_ppm",
    "encode_png",
    "ImageDecoder",
    "AudioFeaturizer",
    "frame_sample",
    "decode_images",
]

MEDIA_SCHEMA = pa.schema(
    [
        ("media_id", pa.int64()),
        ("media_type", pa.string()),  # image/png, audio/wav, video/mp4 ...
        ("payload", pa.binary()),
        ("n_bytes", pa.int64()),
    ]
)


def encode_ppm(img: np.ndarray) -> bytes:
    """Encode an (h, w, 3) uint8 array as a P6 PPM (real image format)."""
    h, w, _ = img.shape
    return b"P6\n%d %d\n255\n" % (w, h) + img.tobytes()


def _decode_ppm(payload: bytes) -> np.ndarray:
    """REAL dependency-free decoder for binary PPM (P6): header
    ``P6 <w> <h> <maxval>`` (whitespace/comment separated) + raw RGB."""
    if not payload.startswith(b"P6"):
        raise ValueError("not a P6 PPM payload")
    # header tokenizer: whitespace-separated fields, '#' comments to EOL
    pos = 2
    fields: list[int] = []
    while len(fields) < 3:
        while pos < len(payload) and payload[pos : pos + 1].isspace():
            pos += 1
        if payload[pos : pos + 1] == b"#":
            pos = payload.index(b"\n", pos) + 1
            continue
        start = pos
        while pos < len(payload) and not payload[pos : pos + 1].isspace():
            pos += 1
        fields.append(int(payload[start:pos]))
    pos += 1  # single whitespace after maxval
    w, h, maxval = fields
    if maxval > 255:
        raise ValueError("16-bit PPM not supported")
    data = np.frombuffer(payload, dtype=np.uint8, count=w * h * 3, offset=pos)
    return data.reshape(h, w, 3)


_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _png_chunk(typ: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data))
        + typ
        + data
        + struct.pack(">I", zlib.crc32(typ + data) & 0xFFFFFFFF)
    )


def encode_png(img: np.ndarray) -> bytes:
    """REAL dependency-free PNG encoder: (h, w, 3) uint8 → non-interlaced
    8-bit truecolor PNG (filter 0 scanlines, stdlib zlib, CRC chunks).
    Decodable by any PNG reader."""
    h, w, _ = img.shape
    raw = b"".join(b"\x00" + img[y].tobytes() for y in range(h))
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    return (
        _PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(raw, 9))
        + _png_chunk(b"IEND", b"")
    )


def _decode_png(payload: bytes) -> np.ndarray:
    """REAL dependency-free PNG decoder (stdlib zlib): non-interlaced
    8-bit gray (0) / RGB (2) / RGBA (6), all five scanline filters
    (None/Sub/Up/Average/Paeth per the PNG spec), CRC-verified chunks.
    Returns (h, w, 3) uint8 — gray is broadcast, alpha is dropped.
    Per-row unfiltering is numpy; Average/Paeth walk pixels within a row
    (spec-sequential) — fine for the feature-extraction batch sizes this
    stage runs at; swap in PIL via ``ImageDecoder`` on clusters that
    have it for multi-megapixel corpora."""
    if not payload.startswith(_PNG_SIG):
        raise ValueError("not a PNG payload")
    pos, ihdr, idat = len(_PNG_SIG), None, []
    while pos + 8 <= len(payload):
        (length,) = struct.unpack(">I", payload[pos : pos + 4])
        typ = payload[pos + 4 : pos + 8]
        data = payload[pos + 8 : pos + 8 + length]
        (crc,) = struct.unpack(">I", payload[pos + 8 + length : pos + 12 + length])
        if zlib.crc32(typ + data) & 0xFFFFFFFF != crc:
            raise ValueError(f"PNG chunk {typ!r} CRC mismatch")
        if typ == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", data)
        elif typ == b"IDAT":
            idat.append(data)
        elif typ == b"IEND":
            break
        pos += 12 + length
    if ihdr is None or not idat:
        raise ValueError("PNG missing IHDR/IDAT")
    w, h, depth, ctype, comp, filt, interlace = ihdr
    if depth != 8 or comp != 0 or filt != 0 or interlace != 0 or ctype not in (0, 2, 6):
        raise ValueError(
            f"unsupported PNG (depth={depth} color={ctype} interlace={interlace}); "
            "this decoder handles non-interlaced 8-bit gray/RGB/RGBA"
        )
    ch = {0: 1, 2: 3, 6: 4}[ctype]
    stride = w * ch
    raw = zlib.decompress(b"".join(idat))
    if len(raw) != h * (stride + 1):
        raise ValueError("PNG data length mismatch")
    out = np.zeros((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.int32)
    for y in range(h):
        ft = raw[y * (stride + 1)]
        line = np.frombuffer(
            raw, dtype=np.uint8, count=stride, offset=y * (stride + 1) + 1
        ).astype(np.int32)
        if ft == 0:  # None
            recon = line
        elif ft == 1:  # Sub: prefix sum per channel offset (mod 256)
            recon = np.cumsum(line.reshape(w, ch), axis=0, dtype=np.int64).reshape(
                stride
            )
        elif ft == 2:  # Up
            recon = line + prev
        elif ft == 3:  # Average — sequential in x per spec
            recon = line.copy()
            for x in range(stride):
                a = recon[x - ch] & 0xFF if x >= ch else 0
                recon[x] += (a + (prev[x] & 0xFF)) >> 1
        elif ft == 4:  # Paeth — sequential in x per spec
            recon = line.copy()
            for x in range(stride):
                a = recon[x - ch] & 0xFF if x >= ch else 0
                b = prev[x] & 0xFF
                c = (prev[x - ch] & 0xFF) if x >= ch else 0
                p = a + b - c
                pa_, pb, pc_ = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa_ <= pb and pa_ <= pc_) else (b if pb <= pc_ else c)
                recon[x] += pred
        else:
            raise ValueError(f"bad PNG filter type {ft}")
        recon = recon & 0xFF
        out[y] = recon.astype(np.uint8)
        prev = recon
    img = out.reshape(h, w, ch)
    if ctype == 0:
        return np.repeat(img, 3, axis=2)
    if ctype == 6:
        return np.ascontiguousarray(img[:, :, :3])
    return img


def make_synthetic_media_table(n: int, seed: int = 42, payload_bytes: int = 4096) -> pa.Table:
    """Deterministic media rows: image rows carry REAL payloads — P6 PPM
    and true PNG, both decodable in-container — audio/video rows carry
    opaque bytes for the stub paths."""
    rng = np.random.default_rng(seed)
    types = np.array(
        ["image/x-portable-pixmap", "image/png", "audio/wav", "video/mp4"]
    )
    mt = types[rng.integers(0, len(types), n)]
    payloads = []
    for t in mt:
        if t == "image/x-portable-pixmap":
            h, w = int(rng.integers(8, 33)), int(rng.integers(8, 33))
            payloads.append(
                encode_ppm(rng.integers(0, 256, (h, w, 3), dtype=np.uint8))
            )
        elif t == "image/png":
            h, w = int(rng.integers(8, 33)), int(rng.integers(8, 33))
            payloads.append(
                encode_png(rng.integers(0, 256, (h, w, 3), dtype=np.uint8))
            )
        else:
            payloads.append(
                rng.integers(0, 256, payload_bytes, dtype=np.uint8).tobytes()
            )
    return pa.table(
        {
            "media_id": pa.array(range(n), pa.int64()),
            "media_type": pa.array(mt, pa.string()),
            "payload": pa.array(payloads, pa.binary()),
            "n_bytes": pa.array([len(p) for p in payloads], pa.int64()),
        }
    )


def _payload_seed(payload: bytes) -> int:
    return int.from_bytes(hashlib.blake2b(payload, digest_size=4).digest(), "big")


def _decode_stub(payload: bytes) -> np.ndarray:
    """STUB decoder: deterministic fake 'image' (seeded by payload hash).

    Marked stub per the build contract — the container has no image libs.
    A real deployment replaces this with PIL/torchvision decode."""
    rng = np.random.default_rng(_payload_seed(payload))
    h, w = int(rng.integers(16, 64)), int(rng.integers(16, 64))
    return rng.integers(0, 256, (h, w, 3), dtype=np.uint8)


class ImageDecoder:
    """Actor-pool stage: decode image payloads → (width, height,
    mean_luma, feature[8]) columns. Decoder state loads ONCE per actor.

    Usage::

        ds.map_batches(ImageDecoder, batch_format="pyarrow",
                       batch_size=64,          # wide binary rows: small!
                       concurrency=(2, 8), num_cpus=1)
    """

    def __init__(self) -> None:
        try:  # real codec if the image exists on this cluster
            from PIL import Image  # noqa: F401

            self._real = True
        except ImportError:
            self._real = False  # stub path (this container)

    def _decode(self, payload: bytes) -> np.ndarray:
        if payload.startswith(b"P6"):
            return _decode_ppm(payload)  # REAL decode, no deps
        if payload.startswith(_PNG_SIG):
            return _decode_png(payload)  # REAL decode, no deps
        if self._real:  # pragma: no cover - not in this container
            import io

            from PIL import Image

            return np.asarray(Image.open(io.BytesIO(payload)).convert("RGB"))
        return _decode_stub(payload)

    def __call__(self, batch: pa.Table) -> pa.Table:
        widths, heights, lumas, feats = [], [], [], []
        for payload in batch["payload"].to_pylist():
            img = self._decode(payload)
            heights.append(img.shape[0])
            widths.append(img.shape[1])
            luma = img.astype(np.float32).mean(axis=2)
            lumas.append(float(luma.mean()))
            # 8-bin luma histogram as a tiny feature vector
            hist, _ = np.histogram(luma, bins=8, range=(0, 256))
            feats.append((hist / max(1, luma.size)).astype(np.float32))
        return pa.table(
            {
                "media_id": batch["media_id"],
                "media_type": batch["media_type"],
                "width": pa.array(widths, pa.int32()),
                "height": pa.array(heights, pa.int32()),
                "mean_luma": pa.array(np.round(lumas, 4), pa.float64()),
                "feature": pa.FixedSizeListArray.from_arrays(
                    pa.array(np.concatenate(feats), pa.float32()), 8
                ),
            }
        )


def resize_image(img: np.ndarray, height: int, width: int) -> np.ndarray:
    """REAL dependency-free resize. Downscale: area averaging over the
    source boxes (integer-exact box edges via linspace rounding);
    upscale (either axis): nearest neighbor. Deterministic — the same
    payload always yields the same bytes, so resize stages are
    resume/retry idempotent like every other stage."""
    h0, w0 = img.shape[:2]
    if h0 == height and w0 == width:
        return img
    if height <= h0 and width <= w0:
        # area average: split source rows/cols into target-many boxes
        ye = np.linspace(0, h0, height + 1).round().astype(np.int64)
        xe = np.linspace(0, w0, width + 1).round().astype(np.int64)
        acc = img.astype(np.float64)
        # reduce rows then cols with add.reduceat (C-level)
        rows = np.add.reduceat(acc, ye[:-1], axis=0)
        cols = np.add.reduceat(rows, xe[:-1], axis=1)
        area = (np.diff(ye)[:, None] * np.diff(xe)[None, :]).astype(np.float64)
        out = cols / area[..., None]
        return np.clip(np.round(out), 0, 255).astype(np.uint8)
    yi = np.minimum((np.arange(height) * h0) // height, h0 - 1)
    xi = np.minimum((np.arange(width) * w0) // width, w0 - 1)
    return img[yi][:, xi]


def _to_rgb(img: np.ndarray) -> np.ndarray:
    """Normalize a decoded image to (h, w, 3) RGB: 2-D grayscale
    broadcasts across channels, RGBA drops alpha (the PNG encoder and
    the resize kernel are 3-channel; the PNG DECODER deliberately
    supports more — this is the bridge)."""
    if img.ndim == 2:
        return np.repeat(img[:, :, None], 3, axis=2)
    if img.shape[2] == 4:
        return np.ascontiguousarray(img[:, :, :3])
    if img.shape[2] == 3:
        return img
    raise ValueError(f"unsupported channel count {img.shape[2]}")


class ImageResizer:
    """Actor-pool stage: decode → normalize to RGB → resize → re-encode
    PNG. Same codec dispatch as :class:`ImageDecoder` (decoder state
    once per actor); grayscale/RGBA inputs normalize via :func:`_to_rgb`
    so every decodable payload resizes. Output rows carry the resized
    PNG payload with REFRESHED metadata — ``media_type`` becomes
    ``image/png`` and ``n_bytes`` the new payload size (stale metadata
    would misroute downstream consumers that trust the column).

    Usage: ``resize_images(ds, 64, 64)`` (the fn_constructor_kwargs
    pattern — passing a constructed instance's class to map_batches
    would silently drop the sizes).
    """

    def __init__(self, height: int = 64, width: int = 64) -> None:
        self.height, self.width = int(height), int(width)
        self._dec = ImageDecoder()

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads, heights, widths = [], [], []
        for payload in batch["payload"].to_pylist():
            img = resize_image(
                _to_rgb(self._dec._decode(payload)), self.height, self.width
            )
            payloads.append(encode_png(img))
            heights.append(img.shape[0])
            widths.append(img.shape[1])
        return pa.table(
            {
                "media_id": batch["media_id"],
                "media_type": pa.array(
                    ["image/png"] * len(batch), pa.string()
                ),
                "payload": pa.array(payloads, pa.binary()),
                "n_bytes": pa.array(
                    [len(p) for p in payloads], pa.int64()
                ),
                "height": pa.array(heights, pa.int32()),
                "width": pa.array(widths, pa.int32()),
            }
        )


def resize_images(
    ds,
    height: int = 64,
    width: int = 64,
    concurrency: tuple[int, int] | int = (1, 4),
    batch_size: int = 64,
):
    """Convenience wrapper: the ImageResizer actor pool (small batches —
    binary rows are wide; state loads once per actor)."""
    return ds.map_batches(
        ImageResizer,
        fn_constructor_kwargs={"height": height, "width": width},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
        **remote_env(),
    )


def encode_wav(pcm: np.ndarray, sample_rate: int = 16_000) -> bytes:
    """REAL RIFF/WAVE encoder (stdlib ``wave`` + int16 numpy) — lets the
    audio path exercise genuine container parsing, not just raw bytes."""
    import io
    import wave

    pcm = np.asarray(pcm, dtype=np.int16)
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sample_rate)
        w.writeframes(pcm.tobytes())
    return buf.getvalue()


def _decode_wav(payload: bytes) -> tuple[np.ndarray, int]:
    """REAL RIFF/WAVE decoder (stdlib ``wave``): returns (mono int16
    samples, sample_rate). Raises ``wave.Error`` on a non-WAV payload."""
    import io
    import wave

    with wave.open(io.BytesIO(payload), "rb") as w:
        rate = w.getframerate()
        n = w.getnframes()
        raw = w.readframes(n)
        width = w.getsampwidth()
        if width == 1:  # 8-bit WAV is unsigned, offset-128
            u8 = np.frombuffer(raw, dtype=np.uint8).astype(np.int16)
            pcm = ((u8 - 128) << 8).astype(np.int16)
        elif width == 2:
            pcm = np.frombuffer(raw, dtype=np.int16)
        elif width == 4:
            pcm = (np.frombuffer(raw, dtype=np.int32) >> 16).astype(np.int16)
        else:  # 24-bit etc.: not supported by this dependency-free path
            raise wave.Error(f"unsupported sample width {width}")
        if w.getnchannels() > 1:  # average to mono
            pcm = pcm.reshape(-1, w.getnchannels()).mean(axis=1).astype(np.int16)
    return pcm, rate


class AudioFeaturizer:
    """Actor-pool stage: audio payload → (duration_ms, rms,
    zero_crossings) columns.

    RIFF/WAVE payloads decode through a REAL stdlib ``wave`` parser
    (header-derived sample rate); anything else falls back to the
    deterministic raw-PCM16 interpretation (the loudly-labeled stub for
    compressed formats a real cluster image would decode with
    soundfile/librosa in ``__init__``)."""

    def __init__(self, sample_rate: int = 16_000) -> None:
        self.sample_rate = sample_rate  # fallback rate for raw payloads

    def __call__(self, batch: pa.Table) -> pa.Table:
        import wave

        durs, rms, zc = [], [], []
        for payload in batch["payload"].to_pylist():
            try:
                pcm, rate = _decode_wav(payload)
            except (wave.Error, EOFError, ValueError):
                pcm = np.frombuffer(
                    payload[: len(payload) // 2 * 2], dtype=np.int16
                )
                rate = self.sample_rate
            durs.append(int(len(pcm) / rate * 1000))
            if len(pcm):
                f = pcm.astype(np.float64)
                rms.append(float(np.sqrt(np.mean(f**2))))
                zc.append(int(np.count_nonzero(np.signbit(f[1:]) != np.signbit(f[:-1]))))
            else:
                rms.append(0.0)
                zc.append(0)
        return pa.table(
            {
                "media_id": batch["media_id"],
                "duration_ms": pa.array(durs, pa.int64()),
                "rms": pa.array(np.round(rms, 4), pa.float64()),
                "zero_crossings": pa.array(zc, pa.int64()),
            }
        )


def frame_sample(batch: pa.Table, every_n_bytes: int = 1024, max_frames: int = 8) -> pa.Table:
    """Video frame-sampling plumbing: one output row per sampled 'frame'
    (STUB: fixed-stride byte windows stand in for decoded frames). Shows
    the 1→N explode layout a real frame sampler produces."""
    media_ids, frame_idx, frames = [], [], []
    for mid, payload in zip(batch["media_id"].to_pylist(), batch["payload"].to_pylist()):
        for fi in range(min(max_frames, max(1, len(payload) // every_n_bytes))):
            media_ids.append(mid)
            frame_idx.append(fi)
            frames.append(payload[fi * every_n_bytes : (fi + 1) * every_n_bytes])
    return pa.table(
        {
            "media_id": pa.array(media_ids, pa.int64()),
            "frame_idx": pa.array(frame_idx, pa.int32()),
            "frame": pa.array(frames, pa.binary()),
        }
    )


def decode_images(ds, concurrency: tuple[int, int] | int = (1, 4), batch_size: int = 64):
    """Convenience wrapper: the ImageDecoder actor pool with
    wide-binary-row batch sizing."""
    return ds.map_batches(
        ImageDecoder,
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
        **remote_env(),
    )
