"""Pure-stdlib image codec: uncompressed 24-bit BMP (BI_RGB).

This is the REAL decode path for the multimodal surface — no external
image library ships in this container, but the classic Windows BMP
format is simple enough to parse/emit with ``struct`` alone, so the
resize operator (operators/multimodal.resize_images) can resample real
pixels end-to-end: decode → nearest-neighbor resample → re-encode.
Formats other than 24-bit BI_RGB BMP still fall back to the clearly
marked deterministic stub.

Layout handled (the 1987-vintage common case):
- BITMAPFILEHEADER (14 bytes): 'BM', file size, reserved, pixel offset
- BITMAPINFOHEADER (40 bytes): width, height (positive → bottom-up),
  planes=1, bpp=24, compression=0 (BI_RGB)
- pixel rows bottom-up, 3 bytes/pixel (B,G,R), each row zero-padded to
  a 4-byte boundary

The decode returns a top-down ``rows[y][x] = (b, g, r)`` grid so callers
never see the bottom-up storage order.
"""

from __future__ import annotations

import struct

_FILE_HEADER = struct.Struct("<2sIHHI")
_INFO_HEADER = struct.Struct("<IiiHHIIiiII")
HEADER_BYTES = _FILE_HEADER.size + _INFO_HEADER.size  # 54


def row_stride(width: int) -> int:
    """Bytes per stored row: 3*width rounded up to a 4-byte boundary."""
    return (width * 3 + 3) // 4 * 4


def is_bmp(payload: bytes) -> bool:
    return len(payload) >= HEADER_BYTES and payload[:2] == b"BM"


def encode_bmp(width: int, height: int, rows: list[list[tuple[int, int, int]]]) -> bytes:
    """Encode a top-down (b, g, r) pixel grid as a 24-bit BI_RGB BMP."""
    stride = row_stride(width)
    size = HEADER_BYTES + stride * height
    out = bytearray(size)
    _FILE_HEADER.pack_into(out, 0, b"BM", size, 0, 0, HEADER_BYTES)
    _INFO_HEADER.pack_into(
        out, _FILE_HEADER.size, 40, width, height, 1, 24, 0,
        stride * height, 2835, 2835, 0, 0,
    )
    for y in range(height):
        # BMP stores rows bottom-up
        base = HEADER_BYTES + (height - 1 - y) * stride
        row = rows[y]
        for x in range(width):
            b, g, r = row[x]
            off = base + x * 3
            out[off] = b
            out[off + 1] = g
            out[off + 2] = r
    return bytes(out)


def decode_bmp(payload: bytes) -> tuple[int, int, list[list[tuple[int, int, int]]]]:
    """Decode a 24-bit BI_RGB BMP into (width, height, top-down rows).

    Raises ``ValueError`` for anything that is not an uncompressed
    24-bit bottom-up BMP — callers use that to fall back to the stub.
    """
    if not is_bmp(payload):
        raise ValueError("not a BMP payload")
    _, _, _, _, px_off = _FILE_HEADER.unpack_from(payload, 0)
    (hdr, width, height, planes, bpp, comp, _, _, _, _, _) = _INFO_HEADER.unpack_from(
        payload, _FILE_HEADER.size
    )
    if hdr < 40 or planes != 1 or bpp != 24 or comp != 0 or height <= 0 or width <= 0:
        raise ValueError("unsupported BMP variant (need 24-bit BI_RGB bottom-up)")
    stride = row_stride(width)
    if len(payload) < px_off + stride * height:
        raise ValueError("truncated BMP payload")
    rows = []
    for y in range(height):
        base = px_off + (height - 1 - y) * stride
        rows.append(
            [
                (payload[base + 3 * x], payload[base + 3 * x + 1], payload[base + 3 * x + 2])
                for x in range(width)
            ]
        )
    return width, height, rows


def resize_nearest(
    rows: list[list[tuple[int, int, int]]],
    src_w: int,
    src_h: int,
    dst_w: int,
    dst_h: int,
) -> list[list[tuple[int, int, int]]]:
    """Nearest-neighbor resample: dst(x, y) = src(x*src_w // dst_w,
    y*src_h // dst_h) — pure integer index math, so the mapping is
    reproducible in SQL (the mm5 oracle replays it with the same
    floor-division)."""
    return [
        [rows[y * src_h // dst_h][x * src_w // dst_w] for x in range(dst_w)]
        for y in range(dst_h)
    ]


def resize_bmp(payload: bytes, width: int, height: int) -> bytes:
    """Decode a BMP, nearest-neighbor resample to width×height, re-encode."""
    src_w, src_h, rows = decode_bmp(payload)
    return encode_bmp(width, height, resize_nearest(rows, src_w, src_h, width, height))


def synthetic_pixel(asset_id: int, x: int, y: int) -> tuple[int, int, int]:
    """Deterministic pixel formula for the synthetic BMP fixtures.

    Pure integer arithmetic so the DuckDB oracle can recompute any pixel
    of any asset (and therefore the checksum of a resized image) in SQL.
    """
    return (
        (asset_id * 7 + x * 13 + y * 31) % 256,
        (asset_id * 11 + x * 17 + y * 5) % 256,
        (asset_id * 3 + x * 29 + y * 23) % 256,
    )


def synthetic_bmp(asset_id: int, width: int, height: int) -> bytes:
    """A real, decodable BMP whose pixels follow :func:`synthetic_pixel`."""
    return encode_bmp(
        width,
        height,
        [[synthetic_pixel(asset_id, x, y) for x in range(width)] for y in range(height)],
    )


# ---------------------------------------------------------------------------
# Pure-stdlib audio codec: mono 16-bit PCM WAV (RIFF/WAVE)
# ---------------------------------------------------------------------------
# The REAL decode path for the audio surface, mirroring the BMP story:
# no audio library ships in this container, but canonical PCM WAV is a
# fixed RIFF layout that ``struct`` parses directly, so audio operators
# can slice/aggregate real samples end-to-end. Non-PCM / multi-channel
# payloads raise ValueError and callers fall back to the marked stub.

_FMT_CHUNK = struct.Struct("<HHIIHH")


def is_wav(payload: bytes) -> bool:
    return (
        len(payload) >= 44
        and payload[:4] == b"RIFF"
        and payload[8:12] == b"WAVE"
    )


def encode_wav(samples: list[int], sample_rate: int = 8000) -> bytes:
    """Encode mono 16-bit PCM samples as a canonical 44-byte-header WAV."""
    data = struct.pack(f"<{len(samples)}h", *samples)
    out = bytearray()
    out += struct.pack("<4sI4s", b"RIFF", 36 + len(data), b"WAVE")
    out += struct.pack("<4sI", b"fmt ", 16)
    out += _FMT_CHUNK.pack(1, 1, sample_rate, sample_rate * 2, 2, 16)
    out += struct.pack("<4sI", b"data", len(data))
    out += data
    return bytes(out)


def decode_wav(payload: bytes) -> tuple[int, list[int]]:
    """Decode a mono 16-bit PCM WAV into (sample_rate, samples).

    Walks RIFF chunks generically (fmt need not be adjacent to data;
    odd-sized chunks are word-aligned per the RIFF spec). Raises
    ``ValueError`` for anything that is not mono 16-bit PCM — callers
    use that to fall back to the stub.
    """
    if not is_wav(payload):
        raise ValueError("not a WAV payload")
    pos, rate, channels, bits, samples = 12, None, None, None, None
    while pos + 8 <= len(payload):
        cid, csz = struct.unpack_from("<4sI", payload, pos)
        pos += 8
        if cid == b"fmt ":
            fmt, channels, rate, _, _, bits = _FMT_CHUNK.unpack_from(payload, pos)
            if fmt != 1:
                raise ValueError("unsupported WAV (need PCM)")
        elif cid == b"data":
            if bits is None:
                raise ValueError("data chunk before fmt chunk")
            if bits != 16 or channels != 1:
                raise ValueError("unsupported WAV (need mono 16-bit)")
            data = payload[pos : pos + csz]
            samples = list(struct.unpack(f"<{len(data) // 2}h", data))
        pos += csz + (csz & 1)
    if rate is None or samples is None:
        raise ValueError("missing fmt/data chunk")
    return rate, samples


def slice_wav(payload: bytes, start: int, end: int) -> bytes:
    """Decode, slice samples [start:end), re-encode at the same rate."""
    rate, samples = decode_wav(payload)
    return encode_wav(samples[start:end], rate)


def synthetic_sample(asset_id: int, i: int) -> int:
    """Deterministic sample formula for the synthetic WAV fixtures —
    pure integer arithmetic a SQL oracle replays verbatim."""
    return ((asset_id * 7919 + i * 4409) % 9973) - 4986


def synthetic_wav(asset_id: int, n_samples: int, sample_rate: int = 8000) -> bytes:
    """A real, decodable WAV whose samples follow :func:`synthetic_sample`."""
    return encode_wav(
        [synthetic_sample(asset_id, i) for i in range(n_samples)], sample_rate
    )


# ---------------------------------------------------------------------------
# Pure-stdlib video codec: YUV4MPEG2 (.y4m), C420 planar
# ---------------------------------------------------------------------------
# The REAL decode path for the video surface, completing the modality
# trio (BMP images, PCM-WAV audio, Y4M video). Y4M is the standard
# uncompressed interchange format (mplayer/ffmpeg): a plain-text header
# "YUV4MPEG2 W<w> H<h> F<n>:<d> ... C420..." followed by frames, each
# "FRAME\n" + W*H luma bytes + (W/2)*(H/2) Cb + (W/2)*(H/2) Cr.
# Non-420 color modes raise ValueError and callers fall back to the stub.

_Y4M_MAGIC = b"YUV4MPEG2 "


def is_y4m(payload: bytes) -> bool:
    return payload.startswith(_Y4M_MAGIC)


def encode_y4m(
    width: int,
    height: int,
    frames: list[tuple[bytes, bytes, bytes]],
    fps: int = 25,
) -> bytes:
    """Encode (y, cb, cr) C420 planes as a YUV4MPEG2 stream."""
    out = bytearray(
        f"YUV4MPEG2 W{width} H{height} F{fps}:1 Ip A1:1 C420jpeg\n".encode()
    )
    for y, cb, cr in frames:
        out += b"FRAME\n"
        out += y
        out += cb
        out += cr
    return bytes(out)


def decode_y4m(
    payload: bytes,
) -> tuple[int, int, int, list[tuple[bytes, bytes, bytes]]]:
    """Decode a C420 YUV4MPEG2 stream into (w, h, fps, frames).

    Raises ``ValueError`` for anything that is not 4:2:0 planar — the
    callers' stub-fallback signal.
    """
    if not is_y4m(payload):
        raise ValueError("not a YUV4MPEG2 payload")
    nl = payload.index(b"\n")
    width = height = fps = None
    color = "420jpeg"
    for tok in payload[len(_Y4M_MAGIC) : nl].split(b" "):
        if not tok:
            continue
        key, val = chr(tok[0]), tok[1:].decode()
        if key == "W":
            width = int(val)
        elif key == "H":
            height = int(val)
        elif key == "F":
            fps = int(val.split(":")[0]) // max(int(val.split(":")[1]), 1)
        elif key == "C":
            color = val
    if width is None or height is None:
        raise ValueError("missing W/H in Y4M header")
    if not color.startswith("420"):
        raise ValueError(f"unsupported Y4M color mode C{color} (need 420)")
    y_size = width * height
    c_size = (width // 2) * (height // 2)
    frames = []
    pos = nl + 1
    while pos < len(payload):
        fnl = payload.index(b"\n", pos)
        if payload[pos : pos + 5] != b"FRAME":
            raise ValueError("malformed Y4M frame marker")
        pos = fnl + 1
        end = pos + y_size + 2 * c_size
        if end > len(payload):
            raise ValueError("truncated Y4M frame")
        frames.append(
            (
                payload[pos : pos + y_size],
                payload[pos + y_size : pos + y_size + c_size],
                payload[pos + y_size + c_size : end],
            )
        )
        pos = end
    return width, height, fps or 25, frames


def slice_y4m(payload: bytes, start: int, end: int) -> bytes:
    """Decode, keep frames [start:end), re-encode with the same geometry."""
    w, h, fps, frames = decode_y4m(payload)
    return encode_y4m(w, h, frames[start:end], fps)


def synthetic_y4m_plane(asset_id: int, frame: int, plane: int, i: int) -> int:
    """Deterministic plane-byte formula (plane 0=Y, 1=Cb, 2=Cr) — pure
    integer arithmetic a SQL oracle replays verbatim."""
    return (asset_id * (3 + 2 * plane) + frame * (7 + 4 * plane) + i * (5 + 8 * plane)) % 256


def synthetic_y4m(asset_id: int, width: int, height: int, n_frames: int) -> bytes:
    """A real, decodable Y4M stream whose planes follow
    :func:`synthetic_y4m_plane`."""
    y_size = width * height
    c_size = (width // 2) * (height // 2)
    frames = [
        (
            bytes(synthetic_y4m_plane(asset_id, f, 0, i) for i in range(y_size)),
            bytes(synthetic_y4m_plane(asset_id, f, 1, i) for i in range(c_size)),
            bytes(synthetic_y4m_plane(asset_id, f, 2, i) for i in range(c_size)),
        )
        for f in range(n_frames)
    ]
    return encode_y4m(width, height, frames)
