"""Pure-NumPy media codecs: RIFF/WAVE PCM16 and BMP (24-bit BI_RGB).

The container has no image/audio libraries, but these two formats need
none — their containers are plain structs — so the multimodal decode
stage can be REAL for them: bytes in, headers validated, payload
parsed, features out.  The formats were chosen precisely because a
from-scratch decoder is verifiable: the driver query synthesizes
genuine WAV/BMP payloads from a closed-form generator, decodes them
through THIS parser, and the DuckDB oracle recomputes the expected
features from the same closed form — an end-to-end decode check with
no codec library in the loop.

Anything beyond these formats (JPEG/PNG/MP3/...) still goes through
:func:`qsketch.spark.multimodal.register_codec` with a real library on
a real cluster; the stub remains the fallback for unregistered types.
"""

from __future__ import annotations

import struct

import numpy as np

# ---------------- WAV (RIFF PCM16 little-endian) ---------------------------


def encode_wav_pcm16(samples: np.ndarray, rate: int) -> bytes:
    """Mono 16-bit PCM WAV."""
    data = np.asarray(samples, dtype="<i2").tobytes()
    hdr = b"RIFF" + struct.pack("<I", 36 + len(data)) + b"WAVE"
    fmt = b"fmt " + struct.pack("<IHHIIHH", 16, 1, 1, rate, rate * 2, 2, 16)
    return hdr + fmt + b"data" + struct.pack("<I", len(data)) + data


def decode_wav_features(payload: bytes) -> dict:
    """Parse a PCM16 WAV: validate RIFF/WAVE magic, walk the chunk list
    to fmt/data (chunks may appear in any order, with pad bytes), and
    return exact integer features."""
    if len(payload) < 12 or payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos, fmt, data = 12, None, None
    while pos + 8 <= len(payload):
        cid = payload[pos:pos + 4]
        (clen,) = struct.unpack_from("<I", payload, pos + 4)
        if pos + 8 + clen > len(payload):
            # a lying chunk length must reject the payload, not
            # silently truncate the sample data
            raise ValueError(f"WAV chunk {cid!r} overruns the payload")
        body = payload[pos + 8:pos + 8 + clen]
        if cid == b"fmt ":
            if clen < 16:
                raise ValueError("WAV fmt chunk too short")
            fmt = struct.unpack_from("<HHIIHH", body, 0)
        elif cid == b"data":
            data = body
        pos += 8 + clen + (clen & 1)  # chunks are word-aligned
    if fmt is None or data is None:
        raise ValueError("WAV missing fmt/data chunk")
    audio_format, n_channels, rate, _byte_rate, _block, bits = fmt
    if audio_format != 1 or bits != 16:
        raise ValueError(f"unsupported WAV encoding (fmt={audio_format}, "
                         f"bits={bits}); only PCM16 is built in")
    if rate <= 0 or n_channels <= 0:
        raise ValueError(f"invalid WAV fmt (rate={rate}, "
                         f"channels={n_channels})")
    samples = np.frombuffer(data, dtype="<i2")
    n = len(samples) // n_channels
    return {
        "rate": int(rate),
        "n_channels": int(n_channels),
        "n_samples": int(n),
        "duration_ms": int(n * 1000 // rate),
        "peak": int(np.abs(samples.astype(np.int32)).max()) if n else 0,
    }


# ---------------- BMP (BITMAPINFOHEADER, 24-bit, uncompressed) -------------


def encode_bmp24(pixels: np.ndarray) -> bytes:
    """(H, W, 3) uint8 in RGB order -> BMP bytes (stored bottom-up,
    BGR, rows padded to 4 bytes — the format's own quirks, so the
    decoder is forced to handle them)."""
    h, w, _ = pixels.shape
    row_bytes = w * 3
    pad = (-row_bytes) % 4
    body = bytearray()
    for y in range(h - 1, -1, -1):  # bottom-up
        row = pixels[y, :, ::-1]  # RGB -> BGR
        body += row.tobytes() + b"\x00" * pad
    data_off = 14 + 40
    file_len = data_off + len(body)
    hdr = (b"BM" + struct.pack("<IHHI", file_len, 0, 0, data_off)
           + struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(body),
                         2835, 2835, 0, 0))
    return hdr + bytes(body)


def decode_bmp_features(payload: bytes) -> dict:
    """Parse a 24-bit BMP: validate magic + header, un-pad and re-flip
    the pixel rows, undo BGR, return exact integer channel sums."""
    if len(payload) < 54 or payload[:2] != b"BM":
        raise ValueError("not a BMP payload")
    (data_off,) = struct.unpack_from("<I", payload, 10)
    hdr_size, w, h, _planes, bits, comp = struct.unpack_from(
        "<IiiHHI", payload, 14)
    if hdr_size < 40 or bits != 24 or comp != 0:
        raise ValueError(f"unsupported BMP (bits={bits}, comp={comp}); "
                         "only uncompressed 24-bit is built in")
    if h <= 0 or w <= 0:
        raise ValueError("top-down/degenerate BMP not supported")
    if data_off < 54 or data_off > len(payload):
        # an offset inside the header would "parse" header bytes as
        # pixels and return garbage sums with no error
        raise ValueError(f"BMP data offset {data_off} out of range")
    row_bytes = w * 3
    stride = row_bytes + ((-row_bytes) % 4)
    raw = np.frombuffer(payload, dtype=np.uint8,
                        count=stride * h, offset=data_off)
    rows = raw.reshape(h, stride)[:, :row_bytes].reshape(h, w, 3)
    rgb = rows[::-1, :, ::-1]  # bottom-up -> top-down, BGR -> RGB
    sums = rgb.reshape(-1, 3).sum(axis=0, dtype=np.int64)
    return {
        "width": int(w),
        "height": int(h),
        "sum_r": int(sums[0]),
        "sum_g": int(sums[1]),
        "sum_b": int(sums[2]),
    }
