"""Real media codecs with zero external dependencies.

The reference decodes media with PIL / librosa
(``image_embedder.py:154-157``, ``audio_embedder.py:213``) — libraries
absent in this container. These codecs make the decode stage REAL for
the formats the standard library + numpy can handle end-to-end:

- **PPM/PGM images** (P6/P5 binary netpbm): header parse + raw pixel
  buffer → ``uint8`` array. The interchange format every image tool
  can emit (``convert x.jpg x.ppm``).
- **PNG images** (8-bit gray/RGB/RGBA, non-interlaced): stdlib zlib
  IDAT inflate + per-scanline unfilter (all five PNG filters) in
  numpy — what every modern encoder emits by default.
- **PCM WAV audio** via the stdlib ``wave`` module → int16 samples.

Everything downstream of the decode (resize, pixel statistics,
spectral features) is plain numpy — deterministic, testable,
cluster-ready. Formats outside this set still route to the
PIL/soundfile-gated path in ``pipeline.py``.
"""

from __future__ import annotations

import io
import wave

import numpy as np


# -- netpbm images ----------------------------------------------------------


def encode_ppm(arr: np.ndarray) -> bytes:
    """(H, W, 3) uint8 → binary PPM (P6). Test/data-generation twin of
    :func:`decode_ppm`."""
    arr = np.asarray(arr, dtype=np.uint8)
    h, w = arr.shape[:2]
    return b"P6\n%d %d\n255\n" % (w, h) + arr.tobytes()


def _read_token(buf: io.BytesIO) -> bytes:
    """Next whitespace-delimited header token, skipping '#' comments."""
    tok = b""
    while True:
        c = buf.read(1)
        if not c:
            break
        if c == b"#":  # comment to end of line
            while c and c != b"\n":
                c = buf.read(1)
            continue
        if c.isspace():
            if tok:
                break
            continue
        tok += c
    return tok


def decode_ppm(content: bytes) -> np.ndarray:
    """Binary PPM (P6) / PGM (P5) → uint8 array of shape (H, W, 3) or
    (H, W). Raises ValueError on anything else."""
    buf = io.BytesIO(content)
    magic = _read_token(buf)
    if magic not in (b"P6", b"P5"):
        raise ValueError(f"not a binary netpbm payload: {magic!r}")
    w = int(_read_token(buf))
    h = int(_read_token(buf))
    maxval = int(_read_token(buf))
    if maxval != 255:
        raise ValueError(f"only 8-bit netpbm supported, maxval={maxval}")
    channels = 3 if magic == b"P6" else 1
    raw = buf.read(w * h * channels)
    if len(raw) != w * h * channels:
        raise ValueError("truncated netpbm pixel buffer")
    arr = np.frombuffer(raw, dtype=np.uint8)
    return arr.reshape((h, w, 3)) if channels == 3 else arr.reshape((h, w))


def resize_nearest(arr: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """Nearest-neighbor resize by index sampling — the deterministic
    stand-in for PIL's resize in the CLIP preprocess (224×224)."""
    h, w = arr.shape[:2]
    rows = (np.arange(out_h) * h // out_h).clip(0, h - 1)
    cols = (np.arange(out_w) * w // out_w).clip(0, w - 1)
    return arr[rows][:, cols]


def image_features(arr: np.ndarray) -> list[float]:
    """Deterministic pixel statistics standing where the CLIP forward
    would run: per-channel means, luminance std, aspect ratio, and a
    4-bin luminance histogram — 9 doubles."""
    a = np.asarray(arr, dtype=np.float64)
    if a.ndim == 2:
        a = np.repeat(a[:, :, None], 3, axis=2)
    elif a.shape[2] == 2:  # gray+alpha PNG: luma channel only
        a = np.repeat(a[:, :, :1], 3, axis=2)
    elif a.shape[2] == 4:  # RGBA PNG: drop alpha
        a = a[:, :, :3]
    h, w = a.shape[:2]
    lum = 0.299 * a[:, :, 0] + 0.587 * a[:, :, 1] + 0.114 * a[:, :, 2]
    hist, _ = np.histogram(lum, bins=4, range=(0.0, 256.0))
    n = float(lum.size)
    return [
        float(a[:, :, 0].mean()),
        float(a[:, :, 1].mean()),
        float(a[:, :, 2].mean()),
        float(lum.std()),
        float(w) / float(h),
        *(float(c) / n for c in hist),
    ]


# -- PNG images (stdlib zlib + numpy) ---------------------------------------

_PNG_SIG = b"\x89PNG\r\n\x1a\n"
#: color type → channel count (8-bit depth only; no palette)
_PNG_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}


def _png_chunk(ctype: bytes, data: bytes) -> bytes:
    import struct
    import zlib

    return (
        struct.pack(">I", len(data))
        + ctype
        + data
        + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
    )


def encode_png(arr: np.ndarray, filter_type: int = 0) -> bytes:
    """(H, W), (H, W, 2|3|4) uint8 → PNG bytes (8-bit, non-interlaced).
    ``filter_type`` applies one scanline filter (0=None 1=Sub 2=Up
    3=Average 4=Paeth) to EVERY row — the knob the round-trip property
    tests use to exercise each of :func:`decode_png`'s unfilter paths.
    Test/data-generation twin of :func:`decode_png`."""
    import struct
    import zlib

    arr = np.asarray(arr, dtype=np.uint8)
    if arr.ndim == 2:
        arr = arr[:, :, None]
    h, w, ch = arr.shape
    color_type = {1: 0, 2: 4, 3: 2, 4: 6}[ch]
    bpp = ch
    raw = arr.reshape(h, w * ch).astype(np.int32)
    prev = np.zeros((h, w * ch), dtype=np.int32)
    prev[1:] = raw[:-1]
    left = np.zeros_like(raw)
    left[:, bpp:] = raw[:, :-bpp]
    ul = np.zeros_like(raw)
    ul[1:, bpp:] = raw[:-1, :-bpp]
    if filter_type == 0:
        filt = raw
    elif filter_type == 1:
        filt = raw - left
    elif filter_type == 2:
        filt = raw - prev
    elif filter_type == 3:
        filt = raw - (left + prev) // 2
    elif filter_type == 4:
        p = left + prev - ul
        pa, pb, pc = abs(p - left), abs(p - prev), abs(p - ul)
        pred = np.where(
            (pa <= pb) & (pa <= pc), left, np.where(pb <= pc, prev, ul)
        )
        filt = raw - pred
    else:
        raise ValueError(f"bad filter type {filter_type}")
    filt = (filt & 0xFF).astype(np.uint8)
    scanlines = b"".join(
        bytes([filter_type]) + filt[r].tobytes() for r in range(h)
    )
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    return (
        _PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(scanlines))
        + _png_chunk(b"IEND", b"")
    )


def decode_png(content: bytes) -> np.ndarray:
    """PNG bytes → uint8 array of shape (H, W) for grayscale or
    (H, W, channels) otherwise — the stdlib-zlib decode path (IDAT
    inflate + per-scanline unfilter, all five PNG filters). Supports
    8-bit depth, color types 0/2/4/6, non-interlaced — what every
    modern encoder emits by default. Palette (3), 16-bit, and Adam7
    raise ValueError (route those to the PIL-gated path).

    Reference decodes via PIL (``image_embedder.py:154-157``); this
    closes PNG with zero new dependencies, same spirit as the
    netpbm/WAV/Y4M codecs above."""
    import struct
    import zlib

    if content[:8] != _PNG_SIG:
        raise ValueError("not a PNG payload")
    pos = 8
    idat = b""
    w = h = None
    channels = None
    while pos + 8 <= len(content):
        (length,) = struct.unpack(">I", content[pos:pos + 4])
        ctype = content[pos + 4:pos + 8]
        data = content[pos + 8:pos + 8 + length]
        pos += 12 + length  # len + type + data + crc
        if ctype == b"IHDR":
            w, h, depth, color_type, comp, filt_m, interlace = struct.unpack(
                ">IIBBBBB", data
            )
            if depth != 8:
                raise ValueError(f"only 8-bit PNG supported, depth={depth}")
            if color_type not in _PNG_CHANNELS:
                raise ValueError(
                    f"unsupported PNG color type {color_type} (palette?)"
                )
            if interlace != 0:
                raise ValueError("Adam7 interlacing not supported")
            channels = _PNG_CHANNELS[color_type]
        elif ctype == b"IDAT":
            idat += data
        elif ctype == b"IEND":
            break
    if w is None or channels is None:
        raise ValueError("PNG missing IHDR")
    raw = zlib.decompress(idat)
    stride = w * channels
    if len(raw) != h * (stride + 1):
        raise ValueError("truncated PNG scanline data")
    bpp = channels
    out = np.empty((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.int32)
    for r in range(h):
        ft = raw[r * (stride + 1)]
        cur = np.frombuffer(
            raw, dtype=np.uint8, count=stride, offset=r * (stride + 1) + 1
        ).astype(np.int32)
        if ft == 0:
            pass
        elif ft == 2:  # Up — fully vectorized
            cur = (cur + prev) & 0xFF
        elif ft in (1, 3, 4):
            # Sub/Average/Paeth recur on the just-reconstructed left
            # byte — sequential in i by definition
            for i in range(stride):
                a = cur[i - bpp] if i >= bpp else 0
                if ft == 1:
                    cur[i] = (cur[i] + a) & 0xFF
                elif ft == 3:
                    cur[i] = (cur[i] + (a + prev[i]) // 2) & 0xFF
                else:
                    b = prev[i]
                    c = prev[i - bpp] if i >= bpp else 0
                    p = a + b - c
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                    pred = a if pa <= pb and pa <= pc else (b if pb <= pc else c)
                    cur[i] = (cur[i] + pred) & 0xFF
        else:
            raise ValueError(f"bad PNG filter byte {ft}")
        out[r] = cur.astype(np.uint8)
        prev = cur
    arr = out.reshape(h, w, channels)
    return arr[:, :, 0] if channels == 1 else arr


# -- PCM WAV audio ----------------------------------------------------------


def encode_wav(
    samples: np.ndarray, sample_rate: int = 16_000
) -> bytes:
    """int16 mono samples → PCM WAV bytes (test/data-generation twin)."""
    samples = np.asarray(samples, dtype=np.int16)
    out = io.BytesIO()
    with wave.open(out, "wb") as f:
        f.setnchannels(1)
        f.setsampwidth(2)
        f.setframerate(sample_rate)
        f.writeframes(samples.tobytes())
    return out.getvalue()


def decode_wav(content: bytes) -> tuple[int, np.ndarray]:
    """PCM WAV bytes → (sample_rate, float64 samples in [-1, 1]),
    stereo averaged to mono — the ``librosa.load(..., mono=True)``
    contract of ``audio_embedder.py:213``."""
    with wave.open(io.BytesIO(content), "rb") as f:
        sr = f.getframerate()
        n_ch = f.getnchannels()
        width = f.getsampwidth()
        raw = f.readframes(f.getnframes())
    if width != 2:
        raise ValueError(f"only 16-bit PCM supported, width={width}")
    x = np.frombuffer(raw, dtype=np.int16).astype(np.float64) / 32768.0
    if n_ch > 1:
        x = x.reshape(-1, n_ch).mean(axis=1)
    return sr, x


def audio_features(sr: int, x: np.ndarray) -> list[float]:
    """Deterministic signal statistics standing where the CLAP forward
    would run: duration, RMS, zero-crossing rate, spectral centroid
    and rolloff (rfft) — 5 doubles."""
    n = len(x)
    if n == 0:
        return [0.0, 0.0, 0.0, 0.0, 0.0]
    rms = float(np.sqrt(np.mean(x * x)))
    zcr = float(np.mean(np.abs(np.diff(np.signbit(x).astype(np.int8)))))
    spec = np.abs(np.fft.rfft(x))
    freqs = np.fft.rfftfreq(n, d=1.0 / sr)
    power = spec * spec
    total = float(power.sum())
    if total == 0.0:
        centroid = rolloff = 0.0
    else:
        centroid = float((freqs * power).sum() / total)
        cum = np.cumsum(power)
        rolloff = float(freqs[int(np.searchsorted(cum, 0.85 * total))])
    return [n / float(sr), rms, zcr, centroid, rolloff]


def mel_filterbank(
    sr: int, n_fft: int, n_mels: int, fmin: float = 0.0,
    fmax: float | None = None,
) -> np.ndarray:
    """Triangular mel filterbank (HTK mel scale,
    ``mel = 2595·log10(1 + f/700)``) → ``(n_mels, n_fft//2 + 1)``.
    The front half of every CLAP/Whisper-style audio encoder
    (reference computes this inside librosa, ``audio_embedder.py``);
    pure numpy, deterministic."""
    if fmax is None:
        fmax = sr / 2.0

    def to_mel(f):
        return 2595.0 * np.log10(1.0 + np.asarray(f) / 700.0)

    def from_mel(m):
        return 700.0 * (10.0 ** (np.asarray(m) / 2595.0) - 1.0)

    pts = from_mel(
        np.linspace(to_mel(fmin), to_mel(fmax), n_mels + 2)
    )
    bins = np.floor((n_fft + 1) * pts / sr).astype(np.int64)
    fb = np.zeros((n_mels, n_fft // 2 + 1))
    for m in range(n_mels):
        lo, mid, hi = bins[m], bins[m + 1], bins[m + 2]
        for k in range(lo, mid):
            if mid > lo and 0 <= k < fb.shape[1]:
                fb[m, k] = (k - lo) / (mid - lo)
        for k in range(mid, hi):
            if hi > mid and 0 <= k < fb.shape[1]:
                fb[m, k] = (hi - k) / (hi - mid)
    return fb


def log_mel_spectrogram(
    x: np.ndarray, sr: int, n_fft: int = 256, hop: int = 128,
    n_mels: int = 32,
) -> np.ndarray:
    """Hann-windowed framed power spectrum → mel filterbank →
    ``log10(mel + 1e-10)`` → ``(n_frames, n_mels)``. Vectorized: one
    strided frame matrix, one batched rfft, one matmul against the
    filterbank. Signals shorter than ``n_fft`` are zero-padded to one
    frame."""
    x = np.asarray(x, dtype=np.float64)
    if len(x) < n_fft:
        x = np.pad(x, (0, n_fft - len(x)))
    n_frames = 1 + (len(x) - n_fft) // hop
    idx = (
        np.arange(n_fft)[None, :]
        + hop * np.arange(n_frames)[:, None]
    )
    frames = x[idx] * np.hanning(n_fft)[None, :]
    power = np.abs(np.fft.rfft(frames, axis=1)) ** 2
    mel = power @ mel_filterbank(sr, n_fft, n_mels).T
    return np.log10(mel + 1e-10)


# -- Y4M video ---------------------------------------------------------------


def encode_y4m(frames: np.ndarray, fps: int = 25) -> bytes:
    """(N, H, W) uint8 luma-only frames → YUV4MPEG2 bytes (C420 with
    flat chroma). Test/data-generation twin of :func:`decode_y4m`."""
    frames = np.asarray(frames, dtype=np.uint8)
    n, h, w = frames.shape
    out = io.BytesIO()
    out.write(b"YUV4MPEG2 W%d H%d F%d:1 Ip A1:1 C420\n" % (w, h, fps))
    chroma = np.full((h // 2) * (w // 2), 128, dtype=np.uint8).tobytes()
    for i in range(n):
        out.write(b"FRAME\n")
        out.write(frames[i].tobytes())
        out.write(chroma)  # U plane
        out.write(chroma)  # V plane
    return out.getvalue()


def decode_y4m(content: bytes) -> tuple[float, np.ndarray]:
    """YUV4MPEG2 (C420) → (fps, luma frames as (N, H, W) uint8).

    The one video container that is pure headers + raw planes — the
    zero-dependency REAL video decode path (everything else needs
    ffmpeg/cv2, gated in pipeline.py). Chroma planes are skipped; the
    luma plane is what frame statistics and perceptual hashes use."""
    nl = content.index(b"\n")
    header = content[:nl].split(b" ")
    if header[0] != b"YUV4MPEG2":
        raise ValueError(f"not a y4m stream: {header[0]!r}")
    w = h = None
    fps = 25.0
    for tok in header[1:]:
        if tok.startswith(b"W"):
            w = int(tok[1:])
        elif tok.startswith(b"H"):
            h = int(tok[1:])
        elif tok.startswith(b"F"):
            num, den = tok[1:].split(b":")
            fps = int(num) / int(den)
        elif tok.startswith(b"C") and tok not in (b"C420", b"C420jpeg",
                                                  b"C420mpeg2"):
            raise ValueError(f"only C420 supported: {tok!r}")
    if not w or not h:
        raise ValueError("y4m header missing W/H")
    luma_sz = w * h
    frame_sz = luma_sz + 2 * ((h // 2) * (w // 2))
    pos = nl + 1
    frames = []
    while pos < len(content):
        fe = content.index(b"\n", pos)
        if content[pos:pos + 5] != b"FRAME":
            raise ValueError("bad FRAME marker")
        pos = fe + 1
        luma = np.frombuffer(content[pos:pos + luma_sz], dtype=np.uint8)
        if len(luma) != luma_sz:
            raise ValueError("truncated y4m frame")
        frames.append(luma.reshape(h, w))
        pos += frame_sz
    return fps, np.stack(frames) if frames else np.zeros((0, h, w), np.uint8)
