"""Dependency-free raster codecs: BMP (24-bit uncompressed) and PPM/PGM.

This container has no PIL/opencv/ffmpeg, so the multimodal operators keep a
codec-injection seam (operators/multimodal.py). These pure-numpy decoders
plug REAL formats into that seam — byte-exact parsing of the two classic
uncompressed raster formats — so `decode_media` / `resize_media` run end to
end on genuine image bytes with zero new dependencies:

* BMP: BITMAPFILEHEADER + BITMAPINFOHEADER, 24 bpp, BI_RGB (uncompressed),
  4-byte-aligned rows, bottom-up or top-down (negative height).
* PPM (P6) / PGM (P5): binary netpbm, maxval ≤ 255, `#` comments.

`image_feature_codec` / `image_resize_codec` adapt them to the exact batch
signatures `decode_media(codec=...)` and `resize_media(codec=...)` expect;
format is sniffed per payload from magic bytes.
"""

from __future__ import annotations

import struct

import numpy as np
import pandas as pd

FEATURE_DIM = 8  # matches multimodal.FEATURE_DIM


# ---------------------------------------------------------------- BMP


def decode_bmp(data: bytes) -> np.ndarray:
    """24-bit uncompressed BMP → (height, width, 3) uint8 RGB array.

    Handles the 4-byte row padding and both row orders (positive height =
    bottom-up per the spec, negative = top-down)."""
    if len(data) < 54 or data[:2] != b"BM":
        raise ValueError("not a BMP payload")
    data_off = struct.unpack_from("<I", data, 10)[0]
    hdr_size, width, height = struct.unpack_from("<Iii", data, 14)
    planes, bpp = struct.unpack_from("<HH", data, 26)
    compression = struct.unpack_from("<I", data, 30)[0]
    if hdr_size < 40 or planes != 1:
        raise ValueError(f"unsupported BMP header (size={hdr_size}, planes={planes})")
    if bpp != 24 or compression != 0:
        raise ValueError(f"only 24bpp BI_RGB supported (bpp={bpp}, comp={compression})")
    bottom_up = height > 0
    height = abs(height)
    row_bytes = (width * 3 + 3) & ~3  # rows pad to 4-byte boundaries
    need = data_off + row_bytes * height
    if len(data) < need:
        raise ValueError(f"truncated BMP: {len(data)} < {need} bytes")
    rows = np.frombuffer(data, np.uint8, row_bytes * height, data_off).reshape(
        height, row_bytes
    )
    bgr = rows[:, : width * 3].reshape(height, width, 3)
    if bottom_up:
        bgr = bgr[::-1]
    return bgr[:, :, ::-1].copy()  # BGR storage → RGB


def encode_bmp(img: np.ndarray) -> bytes:
    """(h, w, 3) uint8 RGB → 24-bit BI_RGB BMP bytes (bottom-up)."""
    h, w, c = img.shape
    if c != 3:
        raise ValueError("encode_bmp needs an RGB array")
    row_bytes = (w * 3 + 3) & ~3
    rows = np.zeros((h, row_bytes), np.uint8)
    rows[:, : w * 3] = img[::-1, :, ::-1].reshape(h, w * 3)  # RGB → BGR, flip
    pix = rows.tobytes()
    off = 14 + 40
    header = struct.pack("<2sIHHI", b"BM", off + len(pix), 0, 0, off)
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(pix), 2835, 2835, 0, 0)
    return header + info + pix


# ---------------------------------------------------------------- PPM/PGM


def _pnm_tokens(data: bytes, n: int, start: int) -> tuple[list[int], int]:
    """Read n whitespace-separated integer tokens (skipping `#` comments)
    starting at byte offset `start`; returns (values, offset past the single
    whitespace byte that terminates the last token — the spec's separator
    before raster data)."""
    vals: list[int] = []
    i = start
    while len(vals) < n:
        while i < len(data) and data[i : i + 1].isspace():
            i += 1
        if i < len(data) and data[i : i + 1] == b"#":
            while i < len(data) and data[i] != 0x0A:
                i += 1
            continue
        j = i
        while j < len(data) and not data[j : j + 1].isspace():
            j += 1
        if j == i:
            raise ValueError("truncated PNM header")
        vals.append(int(data[i:j]))
        i = j
    return vals, i + 1  # exactly one whitespace byte after maxval


def decode_pnm(data: bytes) -> np.ndarray:
    """Binary netpbm: P6 → (h, w, 3) RGB, P5 → (h, w) grayscale; uint8."""
    magic = data[:2]
    if magic not in (b"P6", b"P5"):
        raise ValueError("not a binary PPM/PGM payload")
    (w, h, maxval), off = _pnm_tokens(data, 3, 2)
    if maxval > 255:
        raise ValueError("16-bit PNM unsupported")
    ch = 3 if magic == b"P6" else 1
    need = w * h * ch
    if len(data) < off + need:
        raise ValueError(f"truncated PNM: {len(data)} < {off + need}")
    arr = np.frombuffer(data, np.uint8, need, off)
    return arr.reshape(h, w, 3) if ch == 3 else arr.reshape(h, w)


def encode_ppm(img: np.ndarray) -> bytes:
    """(h, w, 3) RGB or (h, w) grayscale uint8 → binary P6/P5 bytes."""
    if img.ndim == 3:
        h, w, _ = img.shape
        return b"P6\n%d %d\n255\n" % (w, h) + img.tobytes()
    h, w = img.shape
    return b"P5\n%d %d\n255\n" % (w, h) + img.tobytes()


# ---------------------------------------------------------------- dispatch


def decode_image(data: bytes) -> np.ndarray:
    """Sniff the container from magic bytes and decode to a uint8 array."""
    if data[:2] == b"BM":
        return decode_bmp(data)
    if data[:2] in (b"P6", b"P5"):
        return decode_pnm(data)
    raise ValueError(f"unknown image magic {data[:2]!r}")


def _as_rgb(img: np.ndarray) -> np.ndarray:
    return np.repeat(img[:, :, None], 3, axis=2) if img.ndim == 2 else img


def nearest_resize(img: np.ndarray, w: int, h: int) -> np.ndarray:
    """Nearest-neighbor resample to (h, w[, ch]) — same index mapping for
    any channel count; floor((i + 0.5) * src / dst) sampling."""
    sh, sw = img.shape[:2]
    yy = np.minimum(((np.arange(h) + 0.5) * sh / h).astype(np.int64), sh - 1)
    xx = np.minimum(((np.arange(w) + 0.5) * sw / w).astype(np.int64), sw - 1)
    return img[yy][:, xx]


# ---- seam adapters (exact signatures from operators/multimodal.py) ------


def image_feature_codec(kinds: pd.Series, payloads: pd.Series) -> pd.Series:
    """`decode_media(codec=...)` adapter: decode each payload and emit
    FEATURE_DIM floats — [width, height, mean R, mean G, mean B,
    std/255, min/255, max/255] (means normalized to [0,1])."""
    feats = []
    for p in payloads:
        img = _as_rgb(decode_image(bytes(p)))
        f = img.astype(np.float64)
        feats.append(
            np.array(
                [
                    img.shape[1],
                    img.shape[0],
                    f[:, :, 0].mean() / 255.0,
                    f[:, :, 1].mean() / 255.0,
                    f[:, :, 2].mean() / 255.0,
                    f.std() / 255.0,
                    f.min() / 255.0,
                    f.max() / 255.0,
                ],
                dtype=np.float32,
            )
        )
    return pd.Series(feats)


def image_resize_codec(payloads: pd.Series, w: int, h: int) -> pd.Series:
    """`resize_media(codec=...)` adapter: decode, nearest-neighbor resize,
    re-encode in the SAME container the payload arrived in."""
    out = []
    for p in payloads:
        data = bytes(p)
        img = nearest_resize(decode_image(data), w, h)
        out.append(encode_bmp(img) if data[:2] == b"BM" else encode_ppm(img))
    return pd.Series(out)


# ---------------------------------------------------------------- WAV (PCM)


def encode_wav(samples: np.ndarray, sample_rate: int = 16000) -> bytes:
    """int16 PCM samples → canonical 44-byte-header RIFF/WAVE bytes.

    Mono (n,) or multi-channel (n, ch); samples are interleaved
    little-endian 16-bit, the universal uncompressed audio container —
    the audio analog of the 24bpp BMP above, parseable with zero deps."""
    s = np.asarray(samples)
    if s.dtype != np.int16:
        raise ValueError(f"samples must be int16, got {s.dtype}")
    ch = 1 if s.ndim == 1 else s.shape[1]
    pcm = s.astype("<i2").tobytes()
    block = ch * 2
    hdr = (
        b"RIFF"
        + struct.pack("<I", 36 + len(pcm))
        + b"WAVE"
        + b"fmt "
        + struct.pack("<IHHIIHH", 16, 1, ch, sample_rate, sample_rate * block, block, 16)
        + b"data"
        + struct.pack("<I", len(pcm))
    )
    return hdr + pcm


def decode_wav(data: bytes) -> tuple[np.ndarray, int]:
    """RIFF/WAVE PCM bytes → (int16 samples [(n,) mono / (n, ch)], rate).

    Walks the chunk list (fmt may be followed by LIST/fact/etc. before
    data) — not just the canonical 44-byte layout; requires
    uncompressed 16-bit PCM (format tag 1)."""
    if len(data) < 12 or data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos, fmt, pcm = 12, None, None
    while pos + 8 <= len(data):
        cid = data[pos : pos + 4]
        size = struct.unpack_from("<I", data, pos + 4)[0]
        body = data[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            fmt = struct.unpack_from("<HHIIHH", body, 0)
        elif cid == b"data":
            if len(body) < size:
                # a size-lying/truncated data chunk must error like the
                # raster/Y4M decoders, not return a short sample array
                raise ValueError(
                    f"truncated WAV data chunk: {len(body)} < {size} bytes"
                )
            pcm = body
        pos += 8 + size + (size & 1)  # chunks pad to even offsets
    if fmt is None or pcm is None:
        raise ValueError("WAVE missing fmt or data chunk")
    tag, ch, rate, _brate, _align, bits = fmt
    if tag != 1 or bits != 16:
        raise ValueError(f"only 16-bit PCM supported (tag={tag}, bits={bits})")
    s = np.frombuffer(pcm, dtype="<i2").astype(np.int16)
    if ch > 1:
        s = s[: (len(s) // ch) * ch].reshape(-1, ch)
    return s, rate


AUDIO_FEATURE_DIM = FEATURE_DIM  # same width as image features


def audio_feature_codec(kinds: pd.Series, payloads: pd.Series) -> pd.Series:
    """`decode_media(codec=...)` adapter for audio: decode each WAV and
    emit FEATURE_DIM floats — [n_samples, sample_rate/1000, mean/2^15,
    rms/2^15, min/2^15, max/2^15, zero-crossing rate, duration_ms]."""
    feats = []
    for p in payloads:
        s, rate = decode_wav(bytes(p))
        mono = s if s.ndim == 1 else s.mean(axis=1)
        f = mono.astype(np.float64)
        n = max(len(f), 1)
        zc = float(np.count_nonzero(np.signbit(f[1:]) != np.signbit(f[:-1]))) / n
        feats.append(
            np.array(
                [
                    len(f),
                    rate / 1000.0,
                    f.mean() / 32768.0 if len(f) else 0.0,
                    np.sqrt((f * f).mean()) / 32768.0 if len(f) else 0.0,
                    f.min() / 32768.0 if len(f) else 0.0,
                    f.max() / 32768.0 if len(f) else 0.0,
                    zc,
                    len(f) * 1000.0 / rate,
                ],
                dtype=np.float32,
            )
        )
    return pd.Series(feats)


def video_feature_codec(kinds: pd.Series, payloads: pd.Series) -> pd.Series:
    """`decode_media(codec=...)` adapter for video: decode each Y4M and
    emit FEATURE_DIM floats — [n_frames, width, height, fps, first-frame
    mean/255, last-frame mean/255, global min/255, global max/255]."""
    feats = []
    for p in payloads:
        frames, (fn, fd) = decode_y4m(bytes(p))
        f = frames.astype(np.float64)
        has = len(frames) > 0
        feats.append(
            np.array(
                [
                    frames.shape[0],
                    frames.shape[2],
                    frames.shape[1],
                    fn / fd,
                    f[0].mean() / 255.0 if has else 0.0,
                    f[-1].mean() / 255.0 if has else 0.0,
                    f.min() / 255.0 if has else 0.0,
                    f.max() / 255.0 if has else 0.0,
                ],
                dtype=np.float32,
            )
        )
    return pd.Series(feats)


def media_feature_codec(kinds: pd.Series, payloads: pd.Series) -> pd.Series:
    """Combined seam adapter: sniff each payload's container (BMP/PNM
    magic vs RIFF vs YUV4MPEG2) and route to the image, audio, or video
    feature codec — one codec callable covering all three real
    modalities. Dispatch is mask-partitioned: each modality codec runs
    ONCE over its slice of the batch (no per-row Series construction —
    per-row Python measured 10-100x a batched pass, CLAUDE.md)."""
    data = payloads.map(bytes)
    is_audio = data.map(lambda d: d[:4] == b"RIFF")
    is_video = data.map(lambda d: d[:9] == b"YUV4MPEG2")
    out = pd.Series([None] * len(data), index=data.index, dtype=object)
    for mask, codec in (
        (is_audio, audio_feature_codec),
        (is_video & ~is_audio, video_feature_codec),
        (~is_audio & ~is_video, image_feature_codec),
    ):
        if mask.any():
            res = codec(kinds[mask], data[mask])
            # pandas .loc assignment aligns by INDEX; the codecs return
            # fresh-indexed Series — assign positionally (CLAUDE.md)
            out.values[mask.to_numpy()] = res.to_numpy()
    return out


# --------------------------------------------------------- Y4M (YUV4MPEG2)


def encode_y4m(frames: np.ndarray, fps: tuple[int, int] = (25, 1)) -> bytes:
    """(n_frames, h, w) uint8 luma planes → YUV4MPEG2 bytes (C420 with
    constant-128 chroma — grayscale video every Y4M reader accepts).

    Y4M is the classic uncompressed video interchange container: an ASCII
    stream header, then per frame an ASCII `FRAME` marker + raw planes.
    The video analog of BMP/WAV above — a REAL format, zero deps.
    Requires even width/height (C420 chroma is 2x2 subsampled)."""
    f = np.asarray(frames)
    if f.dtype != np.uint8 or f.ndim != 3:
        raise ValueError(f"frames must be (n, h, w) uint8, got {f.dtype}{f.shape}")
    n, h, w = f.shape
    if h % 2 or w % 2:
        raise ValueError(f"C420 needs even dims, got {w}x{h}")
    header = f"YUV4MPEG2 W{w} H{h} F{fps[0]}:{fps[1]} Ip A1:1 C420\n".encode()
    chroma = np.full((h // 2) * (w // 2), 128, np.uint8).tobytes()
    out = [header]
    for i in range(n):
        out.append(b"FRAME\n")
        out.append(f[i].tobytes())
        out.append(chroma)
        out.append(chroma)
    return b"".join(out)


def decode_y4m(data: bytes) -> tuple[np.ndarray, tuple[int, int]]:
    """YUV4MPEG2 bytes → ((n_frames, h, w) uint8 luma planes, (fps_n, fps_d)).

    Parses the parameter list (W/H/F tags in any order, unknown tags
    ignored per spec), C420/C420jpeg/C420paldv or Cmono; chroma planes are
    skipped — features here are luma-derived."""
    nl = data.find(b"\n")
    if nl < 0 or not data.startswith(b"YUV4MPEG2"):
        raise ValueError("not a YUV4MPEG2 payload")
    w = h = None
    fps = (25, 1)
    mono = False
    for tag in data[9:nl].split():
        t = tag.decode("ascii", "replace")
        if t[0] == "W":
            w = int(t[1:])
        elif t[0] == "H":
            h = int(t[1:])
        elif t[0] == "F":
            a, b = t[1:].split(":")
            fps = (int(a), int(b))
            if fps[1] <= 0 or fps[0] <= 0:
                raise ValueError(f"bad Y4M frame rate {t}")
        elif t[0] == "C":
            if t[1:].startswith("mono"):
                mono = True
            elif not t[1:].startswith("420"):
                raise ValueError(f"unsupported chroma mode {t}")
    if not w or not h:
        raise ValueError("Y4M header missing W/H")
    luma_len = w * h
    frame_len = luma_len if mono else luma_len + 2 * ((w // 2) * (h // 2))
    frames = []
    pos = nl + 1
    while pos < len(data):
        fnl = data.find(b"\n", pos)
        if fnl < 0 or data[pos : pos + 5] != b"FRAME":
            raise ValueError(f"bad FRAME marker at byte {pos}")
        body = data[fnl + 1 : fnl + 1 + frame_len]
        if len(body) < frame_len:
            raise ValueError(f"truncated frame at byte {fnl + 1}")
        frames.append(
            np.frombuffer(body, np.uint8, luma_len).reshape(h, w)
        )
        pos = fnl + 1 + frame_len
    return (
        np.stack(frames) if frames else np.empty((0, h, w), np.uint8),
        fps,
    )


def video_frame_features(data: bytes, every_n: int = 1) -> np.ndarray:
    """Decode a Y4M payload and emit per-SAMPLED-frame feature rows
    (frame_no, mean, min, max, crossings-of-128) — the decode step of
    frame_sample_plan made real. Returns (k, 5) float32."""
    frames, _fps = decode_y4m(data)
    idx = np.arange(0, len(frames), max(every_n, 1))
    out = np.empty((len(idx), 5), np.float32)
    for row, i in enumerate(idx):
        f = frames[i].astype(np.float64)
        out[row] = (
            i,
            f.mean(),
            f.min(),
            f.max(),
            float(np.count_nonzero(np.diff((frames[i] >= 128).ravel()))),
        )
    return out
