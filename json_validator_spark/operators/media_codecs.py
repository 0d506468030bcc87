"""Real codecs for uncompressed media — pure numpy/struct, no libraries.

The container has no image/audio codec libraries, so compressed formats
(JPEG/PNG/MP3/…) stay behind the documented stub in ``media.py``. But
UNCOMPRESSED formats need no library at all: PPM (P6) images are a
text header plus raw RGB bytes, and PCM WAV is a RIFF header plus raw
int16 samples. This module implements genuine encode/decode for both,
so the multimodal pipeline's decode → feature-extract path is REAL
end-to-end for these mimes: bytes in, parsed pixels/samples out,
features computed from the actual decoded content.

Everything is vectorized numpy over Arrow batches when called from
``decode_media_features`` — bytes never stream row-at-a-time through
Python object code beyond the per-payload header parse.
"""

from __future__ import annotations

import struct

import numpy as np

# ----------------------------------------------------------------------
# PPM (P6) — raw RGB image
# ----------------------------------------------------------------------


def encode_ppm(rgb: "np.ndarray") -> bytes:
    """(h, w, 3) uint8 array → binary PPM (P6)."""
    h, w, c = rgb.shape
    if c != 3:
        raise ValueError("PPM needs (h, w, 3)")
    return b"P6\n%d %d\n255\n" % (w, h) + rgb.astype(np.uint8).tobytes()


def decode_ppm(payload: bytes) -> "np.ndarray":
    """Binary PPM (P6) → (h, w, 3) uint8 array. Raises ValueError on a
    malformed header/truncated body — the codec-error path a real
    decoder must surface (S2 acceptance analogue)."""
    if not payload.startswith(b"P6"):
        raise ValueError("not a P6 PPM")
    # header = magic, width, height, maxval separated by whitespace
    parts: list[bytes] = []
    i = 2
    while len(parts) < 3:
        while i < len(payload) and payload[i : i + 1].isspace():
            i += 1
        if i < len(payload) and payload[i : i + 1] == b"#":  # comment line
            while i < len(payload) and payload[i : i + 1] != b"\n":
                i += 1
            continue
        j = i
        while j < len(payload) and not payload[j : j + 1].isspace():
            j += 1
        parts.append(payload[i:j])
        i = j
    i += 1  # single whitespace after maxval
    w, h, maxval = int(parts[0]), int(parts[1]), int(parts[2])
    if maxval != 255:
        raise ValueError(f"unsupported maxval {maxval}")
    body = payload[i : i + w * h * 3]
    if len(body) != w * h * 3:
        raise ValueError("truncated PPM body")
    return np.frombuffer(body, dtype=np.uint8).reshape(h, w, 3)


def ppm_features(payload: bytes) -> dict:
    """Decoded-image features: real means over real pixels."""
    img = decode_ppm(payload)
    h, w, _ = img.shape
    means = img.reshape(-1, 3).mean(axis=0)
    return {
        "width": int(w),
        "height": int(h),
        "mean_r": round(float(means[0]), 6),
        "mean_g": round(float(means[1]), 6),
        "mean_b": round(float(means[2]), 6),
        "brightness": round(float(img.mean() / 255.0), 6),
    }


# ----------------------------------------------------------------------
# WAV — PCM 16-bit mono RIFF
# ----------------------------------------------------------------------


def encode_wav(samples: "np.ndarray", rate: int = 8000) -> bytes:
    """int16 sample array → minimal PCM WAV (mono, 16-bit)."""
    data = samples.astype("<i2").tobytes()
    hdr = struct.pack(
        "<4sI4s4sIHHIIHH4sI",
        b"RIFF", 36 + len(data), b"WAVE", b"fmt ", 16,
        1, 1, rate, rate * 2, 2, 16, b"data", len(data),
    )
    return hdr + data


def decode_wav(payload: bytes) -> tuple[int, "np.ndarray"]:
    """PCM WAV → (sample_rate, int16 samples). Raises ValueError on a
    malformed/unsupported container."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE container")
    (fmt_size,) = struct.unpack("<I", payload[16:20])
    audio_fmt, channels, rate = struct.unpack("<HHI", payload[20:28])
    bits = struct.unpack("<H", payload[34:36])[0]
    if audio_fmt != 1 or channels != 1 or bits != 16:
        raise ValueError("only PCM mono 16-bit supported")
    data_off = 20 + fmt_size
    if payload[data_off : data_off + 4] != b"data":
        raise ValueError("missing data chunk")
    (n_bytes,) = struct.unpack("<I", payload[data_off + 4 : data_off + 8])
    body = payload[data_off + 8 : data_off + 8 + n_bytes]
    if len(body) != n_bytes:
        raise ValueError("truncated WAV body")
    return rate, np.frombuffer(body, dtype="<i2")


def wav_features(payload: bytes) -> dict:
    """Decoded-audio features over real samples: duration, RMS level,
    zero-crossing rate (the crude pitch/noisiness proxy)."""
    rate, s = decode_wav(payload)
    x = s.astype(np.float64) / 32768.0
    zc = float(np.mean(np.abs(np.diff(np.signbit(x).astype(np.int8))))) if len(x) > 1 else 0.0
    return {
        "duration_ms": int(round(1000.0 * len(s) / rate)),
        "rms": round(float(np.sqrt(np.mean(x * x))) if len(x) else 0.0, 6),
        "zero_cross_rate": round(zc, 6),
    }
