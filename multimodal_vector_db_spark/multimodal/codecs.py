"""Real media codecs with zero external dependencies.

The reference decodes media with PIL / librosa
(``image_embedder.py:154-157``, ``audio_embedder.py:213``) — libraries
absent in this container. These codecs make the decode stage REAL for
the formats the standard library + numpy can handle end-to-end:

- **PPM/PGM images** (P6/P5 binary netpbm): header parse + raw pixel
  buffer → ``uint8`` array. The interchange format every image tool
  can emit (``convert x.jpg x.ppm``).
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
