"""Pure-NumPy image/video codecs for the multimodal operators.

Real decode for container-friendly uncompressed formats — no
PIL/ffmpeg needed (those libs are absent in this container, and the
north-star only requires that the *Spark-side* contract plus a real
pixel path exist):

* PPM ``P6`` (binary RGB) and ``P3`` (ASCII RGB) — the classic
  netpbm formats; P3 matters because valid images can be synthesized
  from pure Spark string expressions (``format_string`` → ``encode``)
  so the oracle-checked queries can exercise real pixels without any
  Python on the write side.
* BMP 24-bit uncompressed (``BM`` magic, BITMAPINFOHEADER,
  bottom-up BGR rows with 4-byte padding).
* "Video" = sequential concatenation of PPM frames (a trivial but
  real container: each frame is self-delimiting, so the stream splits
  without an index — the shape ffmpeg's rawvideo/image2pipe uses).

Anything that is not one of these formats falls back to the
deterministic hash stub in operators/documents.py, keeping unknown
payloads flowing instead of failing the batch.
"""

from __future__ import annotations

import numpy as np

__all__ = [
    "decode_image",
    "decode_audio",
    "audio_features",
    "encode_ppm",
    "encode_bmp",
    "resize_nearest",
    "image_features",
    "split_video_frames",
]


def _parse_ppm_header(payload: bytes, start: int) -> tuple[bytes, list[int], int]:
    """Parse magic + 3 header ints (w, h, maxval), skipping whitespace
    and ``#`` comments. Returns (magic, [w, h, maxval], body_offset)."""
    magic = payload[start : start + 2]
    pos = start + 2
    vals: list[int] = []
    while len(vals) < 3:
        while pos < len(payload) and payload[pos : pos + 1].isspace():
            pos += 1
        if payload[pos : pos + 1] == b"#":
            while pos < len(payload) and payload[pos] != 0x0A:
                pos += 1
            continue
        num = b""
        while pos < len(payload) and payload[pos : pos + 1].isdigit():
            num += payload[pos : pos + 1]
            pos += 1
        if not num:
            raise ValueError("malformed PPM header")
        vals.append(int(num))
    # exactly one whitespace byte separates maxval from the P6 body
    pos += 1
    return magic, vals, pos


def _decode_ppm(payload: bytes, start: int = 0) -> tuple[np.ndarray, int]:
    """Decode one PPM frame at ``start``; returns (HxWx3 uint8, end offset)."""
    magic, (w, h, maxval), pos = _parse_ppm_header(payload, start)
    if maxval <= 0 or maxval > 255:
        raise ValueError(f"unsupported PPM maxval {maxval}")
    if w <= 0 or h <= 0:
        # A (h, 0, 3) array is header-valid but poisons everything
        # downstream (resize indexes into an empty axis, features go
        # NaN); treat degenerate dims as malformed so callers take the
        # fallback path.
        raise ValueError(f"degenerate PPM dims {w}x{h}")
    n = w * h * 3
    if magic == b"P6":
        body = payload[pos : pos + n]
        if len(body) < n:
            raise ValueError("truncated P6 body")
        arr = np.frombuffer(body, dtype=np.uint8).reshape(h, w, 3)
        return arr, pos + n
    if magic == b"P3":
        # ASCII samples; body ends after n integers. Bound the
        # allocation by the bytes actually present BEFORE trusting the
        # header dims — each sample is at least one byte, so a huge
        # declared w*h with a tiny body must raise ValueError (which
        # callers catch), not attempt a multi-GB np.empty that dies
        # with an uncatchable MemoryError inside the Spark task.
        if n > len(payload) - pos:
            raise ValueError("P3 header declares more samples than payload bytes")
        vals = np.empty(n, dtype=np.int64)
        got = 0
        while got < n:
            while pos < len(payload) and payload[pos : pos + 1].isspace():
                pos += 1
            num = b""
            while pos < len(payload) and payload[pos : pos + 1].isdigit():
                num += payload[pos : pos + 1]
                pos += 1
            if not num:
                raise ValueError("truncated P3 body")
            # int(num) is an unbounded Python int; a sample like
            # b"1234567890123456789012" would overflow the int64 store
            # below with an OverflowError that escapes the ValueError-only
            # catches in decode_image / split_video_frames and kills the
            # Spark task. Any sample above maxval is malformed anyway.
            sample = int(num) if len(num) <= 9 else maxval + 1
            if sample > maxval:
                raise ValueError(f"P3 sample {num[:16]!r}... exceeds maxval {maxval}")
            vals[got] = sample
            got += 1
        arr = vals.astype(np.uint8).reshape(h, w, 3)
        return arr, pos
    raise ValueError(f"unsupported PPM magic {magic!r}")


def _decode_bmp(payload: bytes) -> np.ndarray:
    """24-bit uncompressed BMP → HxWx3 uint8 RGB."""
    if payload[:2] != b"BM" or len(payload) < 54:
        raise ValueError("not a BMP")
    data_off = int.from_bytes(payload[10:14], "little")
    w = int.from_bytes(payload[18:22], "little", signed=True)
    h = int.from_bytes(payload[22:26], "little", signed=True)
    bpp = int.from_bytes(payload[28:30], "little")
    comp = int.from_bytes(payload[30:34], "little")
    if bpp != 24 or comp != 0:
        raise ValueError(f"unsupported BMP (bpp={bpp}, compression={comp})")
    bottom_up = h > 0
    h = abs(h)
    if w <= 0 or h == 0:
        raise ValueError(f"degenerate BMP dims {w}x{h}")
    row_bytes = (w * 3 + 3) & ~3
    need = data_off + row_bytes * h
    if len(payload) < need:
        raise ValueError("truncated BMP body")
    rows = np.frombuffer(
        payload[data_off : data_off + row_bytes * h], dtype=np.uint8
    ).reshape(h, row_bytes)[:, : w * 3].reshape(h, w, 3)
    if bottom_up:
        rows = rows[::-1]
    return rows[:, :, ::-1].copy()  # BGR → RGB


def decode_image(payload: bytes | None) -> np.ndarray | None:
    """Decode a supported image payload to HxWx3 uint8 RGB, or None if
    the format is not one of ours (caller falls back to the stub)."""
    if payload is None or len(payload) < 2:
        return None
    try:
        if payload[:2] in (b"P6", b"P3"):
            arr, _ = _decode_ppm(payload)
            return arr
        if payload[:2] == b"BM":
            return _decode_bmp(payload)
    except ValueError:
        return None
    return None


def encode_ppm(arr: np.ndarray) -> bytes:
    """HxWx3 uint8 → binary PPM (P6)."""
    h, w = arr.shape[:2]
    return b"P6\n%d %d\n255\n" % (w, h) + arr.astype(np.uint8).tobytes()


def encode_bmp(arr: np.ndarray) -> bytes:
    """HxWx3 uint8 RGB → 24-bit bottom-up BMP."""
    h, w = arr.shape[:2]
    row_bytes = (w * 3 + 3) & ~3
    body = np.zeros((h, row_bytes), dtype=np.uint8)
    body[:, : w * 3] = arr[::-1, :, ::-1].reshape(h, w * 3)  # RGB → BGR, bottom-up
    raw = body.tobytes()
    data_off = 14 + 40
    header = (
        b"BM"
        + (data_off + len(raw)).to_bytes(4, "little")
        + b"\x00\x00\x00\x00"
        + data_off.to_bytes(4, "little")
        + (40).to_bytes(4, "little")
        + w.to_bytes(4, "little", signed=True)
        + h.to_bytes(4, "little", signed=True)
        + (1).to_bytes(2, "little")
        + (24).to_bytes(2, "little")
        + (0).to_bytes(4, "little")
        + len(raw).to_bytes(4, "little")
        + (2835).to_bytes(4, "little") * 2
        + (0).to_bytes(4, "little") * 2
    )
    return header + raw


def resize_nearest(arr: np.ndarray, width: int, height: int) -> np.ndarray:
    """Nearest-neighbor resize (deterministic, no interpolation drift)."""
    h, w = arr.shape[:2]
    ys = (np.arange(height) * h) // height
    xs = (np.arange(width) * w) // width
    return arr[ys][:, xs]


def image_features(arr: np.ndarray, dim: int = 8) -> list[float]:
    """Deterministic feature vector from real pixels: per-channel means
    (3), per-channel stds (3), then a coarse luma histogram filling the
    remaining dims. All values normalized to [0, 1]."""
    px = arr.astype(np.float64) / 255.0
    feats = [float(px[:, :, c].mean()) for c in range(3)]
    feats += [float(px[:, :, c].std()) for c in range(3)]
    nbins = max(dim - len(feats), 0)
    if nbins:
        luma = 0.299 * px[:, :, 0] + 0.587 * px[:, :, 1] + 0.114 * px[:, :, 2]
        hist, _ = np.histogram(luma, bins=nbins, range=(0.0, 1.0))
        feats += (hist / luma.size).tolist()
    return feats[:dim]


def decode_audio(payload: bytes | None) -> tuple[int, np.ndarray] | None:
    """Decode the ASCII ``A16`` audio format: ``A16\\n<rate> <n>\\n``
    followed by ``n`` whitespace-separated signed 16-bit samples.

    Like P3 for images, A16 exists so REAL waveforms can be
    synthesized from pure Spark string expressions and decoded by a
    dependency-free codec. Returns (sample_rate, int16 samples) or
    None for a None payload; raises ValueError for any malformed
    payload (wrong magic, non-integer fields, sample count mismatch,
    out-of-range samples) — never any other exception type, so the
    mapInPandas fallback contract holds under adversarial bytes."""
    if payload is None:
        return None
    if payload[:4] != b"A16\n":
        raise ValueError("not an A16 payload")
    try:
        header_end = payload.index(b"\n", 4)
    except ValueError:
        raise ValueError("truncated A16 header") from None
    fields = payload[4:header_end].split()
    if len(fields) != 2:
        raise ValueError("A16 header needs '<rate> <n>'")
    try:
        rate, n = int(fields[0]), int(fields[1])
    except (ValueError, OverflowError):
        raise ValueError("non-integer A16 header field") from None
    if rate <= 0 or n < 0 or n > 1 << 24:
        raise ValueError(f"unreasonable A16 header rate={rate} n={n}")
    toks = payload[header_end + 1 :].split()
    if len(toks) != n:
        raise ValueError(f"A16 sample count mismatch: header {n}, got {len(toks)}")
    try:
        vals = [int(t) for t in toks]
    except (ValueError, OverflowError):
        raise ValueError("non-integer A16 sample") from None
    # range-check on the Python ints: arbitrary-precision literals
    # would OverflowError inside np.array, escaping the ValueError-only
    # contract
    if any(v > 32767 or v < -32768 for v in vals):
        raise ValueError("A16 sample out of int16 range")
    return rate, np.array(vals, dtype=np.int16)


def audio_features(samples: np.ndarray, window: int = 8) -> list[tuple[float, float]]:
    """Per-window (rms, zcr) over an int16 waveform: rms normalized by
    the int16 full scale, zcr = strict sign-change count (s[i-1]*s[i]
    < 0) over window-1 adjacent pairs. Integer-derived doubles +
    correctly-rounded sqrt/div make the values bit-identical to a SQL
    re-derivation. The trailing partial window is dropped (training
    featurizers pad or drop; dropping keeps the math exact)."""
    if window < 2:
        # zcr needs >= 1 adjacent pair; a bad window must surface as
        # the contract exception type, not ZeroDivisionError inside a
        # Spark task
        raise ValueError(f"audio_features window must be >= 2, got {window}")
    out: list[tuple[float, float]] = []
    s = samples.astype(np.float64)
    for w0 in range(0, len(s) - window + 1, window):
        win = s[w0 : w0 + window]
        rms = float(np.sqrt(np.dot(win, win) / float(window)) / 32768.0)
        zc = int(np.sum(win[:-1] * win[1:] < 0))
        out.append((rms, zc / float(window - 1)))
    return out


def split_video_frames(payload: bytes, max_frames: int | None = None) -> list[bytes]:
    """Split a concatenated-PPM 'video' into frame byte slices by
    sequential parsing (each frame is self-delimiting; no index
    needed). Raises ValueError if the payload is not PPM-led."""
    if payload[:2] not in (b"P6", b"P3"):
        raise ValueError("not a PPM stream")
    frames: list[bytes] = []
    pos = 0
    while pos < len(payload) and payload[pos : pos + 2] in (b"P6", b"P3"):
        _, end = _decode_ppm(payload, pos)
        frames.append(payload[pos:end])
        pos = end
        while pos < len(payload) and payload[pos : pos + 1].isspace():
            pos += 1
        if max_frames is not None and len(frames) >= max_frames:
            break
    return frames
