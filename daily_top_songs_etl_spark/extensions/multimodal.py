"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video ride as ``binary`` columns with a metadata struct; the
Spark-side contract (schema, partition sizing, Arrow batch shape, UDF
signatures) is real and tested. Image decode is REAL for PNG — a
pure-stdlib decoder (zlib inflate + per-scanline unfilter + palette
expansion, :func:`decode_png`) runs inside the Arrow kernel, so
``fake=False`` extracts features from actual pixel data with no external
codec dependency — AND for BASELINE JPEG (:func:`decode_jpeg`: marker
walk, file-supplied Huffman/quant tables, per-MCU entropy decode,
dequantize + IDCT, generic (h,v) chroma upsampling incl. 4:2:0,
JFIF YCbCr→RGB; validated against a third-party-encoded 4:2:0 fixture
from the CPython test suite). Audio decode is REAL for PCM WAV — a
pure-stdlib RIFF/fmt/data parser (:func:`decode_wav`) feeds amplitude
statistics (:func:`wav_features`). Video decode is REAL for
uncompressed YUV4MPEG2
— a pure-stdlib header + FRAME-plane parser (:func:`decode_y4m`) feeds
luma/motion statistics (:func:`video_features`) — AND for AVI/MJPEG
(:func:`decode_avi_mjpeg`: RIFF chunk walk + the shared baseline-JPEG
kernel per frame; MJPEG is exactly JPEG-per-frame, so it is the one
COMPRESSED video container stdlib-only decode honestly covers).
Inter-frame codecs (H.264/VP9/AV1 — ffmpeg territory) and
progressive/arithmetic JPEG are documented out of scope. The
deterministic fake decoder (``fake=True``) remains for engine-portable
oracle comparison.

Scale notes: binary payloads dominate row size, so ``mapInPandas`` with
``spark.sql.execution.arrow.maxRecordsPerBatch`` tuned down (the default
10k rows × multi-MB payloads would blow executor memory); feature outputs
are tiny relative to inputs, so project early and drop the payload column
as soon as features are extracted.
"""

from __future__ import annotations

import hashlib
import struct
import zlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

_PNG_SIGNATURE = b"\x89PNG\r\n\x1a\n"


def decode_png(data: bytes) -> tuple[int, int, int, bytearray]:
    """Decode a non-interlaced 8-bit-depth PNG with nothing but the
    stdlib: parse chunks, inflate the IDAT stream (zlib), undo the
    per-scanline filters (None/Sub/Up/Average/Paeth, PNG spec §9), and
    expand palettes. Returns ``(width, height, channels, pixels)`` with
    ``pixels`` as row-major interleaved bytes (palette images come back
    as 3-channel RGB).

    Supports color types 0 (gray), 2 (RGB), 3 (palette), 4 (gray+alpha),
    6 (RGBA) at bit depth 8, interlace 0 — the overwhelmingly common
    subset. Anything else raises ``ValueError`` (corrupt or unsupported
    input must fail loudly, not produce garbage features).
    """
    if data[:8] != _PNG_SIGNATURE:
        raise ValueError("not a PNG: bad signature")
    pos = 8
    ihdr = None
    idat = bytearray()
    palette = None
    while pos + 8 <= len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        ctype = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + length]
        if len(body) != length:
            raise ValueError("truncated PNG chunk")
        expect_crc = data[pos + 8 + length : pos + 12 + length]
        if len(expect_crc) != 4:
            # a PNG cut off mid-CRC must fail loudly, not skip the check
            raise ValueError(f"truncated PNG chunk {ctype!r}: missing CRC")
        if struct.unpack(">I", expect_crc)[0] != (
            zlib.crc32(ctype + body) & 0xFFFFFFFF
        ):
            raise ValueError(f"PNG chunk {ctype!r} CRC mismatch")
        if ctype == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", body)
        elif ctype == b"PLTE":
            palette = body
        elif ctype == b"IDAT":
            idat.extend(body)
        elif ctype == b"IEND":
            break
        pos += 12 + length
    if ihdr is None:
        raise ValueError("PNG missing IHDR")
    width, height, depth, color, comp, filt, interlace = ihdr
    if depth != 8 or comp != 0 or filt != 0 or interlace != 0:
        raise ValueError(
            f"unsupported PNG (depth={depth}, interlace={interlace})"
        )
    channels = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}.get(color)
    if channels is None:
        raise ValueError(f"unsupported PNG color type {color}")
    raw = zlib.decompress(bytes(idat))
    stride = width * channels
    if len(raw) != height * (stride + 1):
        raise ValueError("PNG pixel data length mismatch")
    out = bytearray(height * stride)
    prev_row_start = -1
    for y in range(height):
        ftype = raw[y * (stride + 1)]
        line = bytearray(raw[y * (stride + 1) + 1 : (y + 1) * (stride + 1)])
        row_start = y * stride
        if ftype == 0:  # None
            pass
        elif ftype == 1:  # Sub
            for x in range(channels, stride):
                line[x] = (line[x] + line[x - channels]) & 0xFF
        elif ftype == 2:  # Up
            if prev_row_start >= 0:
                for x in range(stride):
                    line[x] = (line[x] + out[prev_row_start + x]) & 0xFF
        elif ftype == 3:  # Average
            for x in range(stride):
                left = line[x - channels] if x >= channels else 0
                up = out[prev_row_start + x] if prev_row_start >= 0 else 0
                line[x] = (line[x] + ((left + up) >> 1)) & 0xFF
        elif ftype == 4:  # Paeth
            for x in range(stride):
                a = line[x - channels] if x >= channels else 0
                b = out[prev_row_start + x] if prev_row_start >= 0 else 0
                c = (
                    out[prev_row_start + x - channels]
                    if (prev_row_start >= 0 and x >= channels)
                    else 0
                )
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                line[x] = (line[x] + pred) & 0xFF
        else:
            raise ValueError(f"unknown PNG filter type {ftype}")
        out[row_start : row_start + stride] = line
        prev_row_start = row_start
    if color == 3:
        if palette is None:
            raise ValueError("palette PNG missing PLTE")
        rgb = bytearray(height * width * 3)
        for i, idx in enumerate(out):
            rgb[i * 3 : i * 3 + 3] = palette[idx * 3 : idx * 3 + 3]
        return width, height, 3, rgb
    return width, height, channels, out


def encode_png(
    width: int, height: int, channels: int, pixels: bytes
) -> bytes:
    """Minimal stdlib PNG encoder (filter type 0 on every scanline) —
    the test-fixture / round-trip counterpart of :func:`decode_png`."""
    color = {1: 0, 2: 4, 3: 2, 4: 6}[channels]

    def chunk(ctype: bytes, body: bytes) -> bytes:
        return (
            struct.pack(">I", len(body))
            + ctype
            + body
            + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF)
        )

    stride = width * channels
    raw = b"".join(
        b"\x00" + bytes(pixels[y * stride : (y + 1) * stride])
        for y in range(height)
    )
    return (
        _PNG_SIGNATURE
        + chunk(b"IHDR", struct.pack(">IIBBBBB", width, height, 8, color, 0, 0, 0))
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


def png_features(payload: bytes) -> list[float]:
    """8-dim feature vector from REAL decoded PNG pixels (see
    :func:`_pixel_features`)."""
    return _pixel_features(*decode_png(payload))


def _pixel_features(
    width: int, height: int, channels: int, px: bytes
) -> list[float]:
    """8-dim feature vector from decoded pixels (PNG and JPEG share this
    tail): log-scaled dims, channel count, per-channel means (missing
    channels 0.0) and overall pixel mean — all plain float64 arithmetic
    over exact byte sums."""
    import math

    n_px = width * height
    sums = [0] * 4
    for i in range(0, len(px), channels):
        for c in range(channels):
            sums[c] += px[i + c]
    means = [
        (sums[c] / n_px / 255.0) if c < channels else 0.0 for c in range(4)
    ]
    overall = sum(sums[:channels]) / (n_px * channels) / 255.0
    return [
        math.log1p(width),
        math.log1p(height),
        float(channels),
        means[0],
        means[1],
        means[2],
        means[3],
        overall,
    ]

def encode_wav(
    sample_rate: int, n_channels: int, bits: int, samples: list[int]
) -> bytes:
    """Minimal stdlib RIFF/WAVE PCM encoder — the test-fixture /
    round-trip counterpart of :func:`decode_wav`. ``samples`` is the
    interleaved sample stream (signed ints for 16-bit, 0..255 unsigned
    for 8-bit, per the WAV spec)."""
    if bits == 16:
        pcm = struct.pack(f"<{len(samples)}h", *samples)
    elif bits == 8:
        pcm = bytes(samples)
    else:
        raise ValueError(f"unsupported bits_per_sample {bits}")
    block_align = n_channels * bits // 8
    fmt = struct.pack(
        "<HHIIHH", 1, n_channels, sample_rate,
        sample_rate * block_align, block_align, bits,
    )
    body = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(pcm)) + pcm
        + (b"\x00" if len(pcm) % 2 else b"")  # RIFF chunks are word-aligned
    )
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_wav(data: bytes) -> tuple[int, int, int, list[int]]:
    """Pure-stdlib RIFF/WAVE PCM parser: validates the RIFF container,
    walks word-aligned chunks to ``fmt `` and ``data``, and decodes the
    sample stream. Returns ``(sample_rate, n_channels, bits, samples)``
    with ``samples`` interleaved and ZERO-CENTERED (8-bit unsigned is
    shifted by −128 so both depths share a signed domain).

    Supports PCM (format tag 1) at 8 or 16 bits — the overwhelmingly
    common subset. Anything else — compressed/float formats, a truncated
    chunk, inconsistent block alignment, missing fmt/data — raises
    ``ValueError``: corrupt input must fail loudly, not produce garbage
    features (same contract as :func:`decode_png`)."""
    if len(data) < 12 or data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a WAV: bad RIFF/WAVE header")
    (declared,) = struct.unpack("<I", data[4:8])
    if declared + 8 > len(data):
        raise ValueError("truncated WAV: RIFF size exceeds payload")
    pos = 12
    fmt = None
    pcm = None
    while pos + 8 <= len(data):
        cid = data[pos : pos + 4]
        (length,) = struct.unpack("<I", data[pos + 4 : pos + 8])
        body = data[pos + 8 : pos + 8 + length]
        if len(body) != length:
            raise ValueError(f"truncated WAV chunk {cid!r}")
        if cid == b"fmt ":
            if length < 16:
                raise ValueError("malformed WAV fmt chunk")
            fmt = struct.unpack("<HHIIHH", body[:16])
        elif cid == b"data":
            pcm = body
        pos += 8 + length + (length & 1)  # chunks are word-aligned
    if fmt is None:
        raise ValueError("WAV missing fmt chunk")
    if pcm is None:
        raise ValueError("WAV missing data chunk")
    audio_format, n_channels, sample_rate, byte_rate, block_align, bits = fmt
    if audio_format != 1 or bits not in (8, 16):
        raise ValueError(
            f"unsupported WAV (format={audio_format}, bits={bits}); "
            "only PCM 8/16-bit is decoded"
        )
    if n_channels < 1 or sample_rate < 1:
        raise ValueError("malformed WAV fmt values")
    if block_align != n_channels * bits // 8:
        raise ValueError("WAV block_align inconsistent with channels/bits")
    if byte_rate != sample_rate * block_align:
        raise ValueError("WAV byte_rate inconsistent with fmt")
    if len(pcm) % block_align:
        raise ValueError("WAV PCM data not frame-aligned")
    if bits == 16:
        samples = list(struct.unpack(f"<{len(pcm) // 2}h", pcm))
    else:
        samples = [b - 128 for b in pcm]
    return sample_rate, n_channels, bits, samples


def wav_features(payload: bytes) -> list[float]:
    """8-dim feature vector from REAL decoded PCM (same shape contract
    as :func:`png_features`): log-scaled rate and length, channel count,
    duration, then amplitude statistics normalized to full scale — RMS,
    peak, zero-crossing rate (channel 0), and DC offset. All statistics
    are exact integer sums before one float division, so the output is
    deterministic across partitionings."""
    import math

    sample_rate, n_channels, bits, samples = decode_wav(payload)
    n_frames = len(samples) // n_channels
    if n_frames == 0:
        return [math.log1p(sample_rate), float(n_channels), 0.0,
                0.0, 0.0, 0.0, 0.0, 0.0]
    full = float(1 << (bits - 1))
    sum_sq = sum(s * s for s in samples)
    peak = max(abs(s) for s in samples)
    dc = sum(samples)
    ch0 = samples[0::n_channels]
    zc = sum(
        1 for i in range(1, len(ch0)) if (ch0[i - 1] < 0) != (ch0[i] < 0)
    )
    return [
        math.log1p(sample_rate),
        float(n_channels),
        math.log1p(n_frames),
        n_frames / sample_rate,
        math.sqrt(sum_sq / len(samples)) / full,
        peak / full,
        zc / max(1, len(ch0) - 1),
        dc / len(samples) / full,
    ]


def encode_y4m(
    width: int,
    height: int,
    frames: list[bytes],
    fps_num: int = 25,
    fps_den: int = 1,
    colorspace: str = "mono",
) -> bytes:
    """Minimal stdlib YUV4MPEG2 encoder — the test-fixture / round-trip
    counterpart of :func:`decode_y4m`. ``frames`` is a list of raw
    planes: ``width*height`` luma bytes per frame for ``mono``, or
    ``width*height*3//2`` (luma + 2 quarter-size chroma planes) for
    ``420``."""
    plane = _y4m_frame_bytes(width, height, colorspace)
    header = (
        f"YUV4MPEG2 W{width} H{height} F{fps_num}:{fps_den} "
        f"Ip A1:1 C{colorspace}\n"
    ).encode("ascii")
    out = [header]
    for f in frames:
        if len(f) != plane:
            raise ValueError(
                f"frame has {len(f)} bytes, expected {plane} "
                f"for {width}x{height} C{colorspace}"
            )
        out.append(b"FRAME\n")
        out.append(bytes(f))
    return b"".join(out)


def _y4m_frame_bytes(width: int, height: int, colorspace: str) -> int:
    if colorspace == "mono":
        return width * height
    if colorspace in ("420", "420jpeg", "420mpeg2", "420paldv"):
        if width % 2 or height % 2:
            raise ValueError("4:2:0 chroma requires even dimensions")
        return width * height * 3 // 2
    if colorspace == "422":
        if width % 2:
            raise ValueError("4:2:2 chroma requires even width")
        return width * height * 2
    if colorspace == "444":
        return width * height * 3
    raise ValueError(f"unsupported Y4M colorspace C{colorspace}")


def decode_y4m(
    data: bytes,
) -> tuple[int, int, int, int, str, list[bytes]]:
    """Pure-stdlib YUV4MPEG2 parser (the mjpegtools interchange format —
    the standard UNCOMPRESSED video container, and the one format real
    video decode is possible in without external codecs). Validates the
    stream magic, parses the header parameters (W/H/F mandatory here,
    interlace/aspect ignored), then walks ``FRAME`` markers slicing
    fixed-size planar YUV frames. Returns ``(width, height, fps_num,
    fps_den, colorspace, frames)`` where each frame is the raw plane
    bytes (luma first).

    Compressed codecs (H.264/VP9/AV1 in mp4/webm) need ffmpeg and stay
    out of scope. Corrupt input — bad magic, missing W/H, a truncated
    frame, an unknown colorspace — raises ``ValueError``: fail loudly,
    never produce garbage features (same contract as :func:`decode_png`
    / :func:`decode_wav`)."""
    magic = b"YUV4MPEG2"
    nl = data.find(b"\n")
    if nl < 0 or not data.startswith(magic):
        raise ValueError("not a Y4M: bad YUV4MPEG2 stream header")
    width = height = None
    fps_num, fps_den = 25, 1
    colorspace = "420"  # the Y4M default when no C tag is present
    for token in data[len(magic):nl].split(b" "):
        token = token.decode("ascii", errors="replace")
        if not token:
            continue
        tag, val = token[0], token[1:]
        if tag == "W":
            width = int(val)
        elif tag == "H":
            height = int(val)
        elif tag == "F":
            num, den = val.split(":")
            fps_num, fps_den = int(num), int(den)
        elif tag == "C":
            colorspace = val
        # Ip/It/Ib (interlace) and A (aspect) don't affect plane layout
    if not width or not height or width < 1 or height < 1:
        raise ValueError("Y4M header missing W/H dimensions")
    if fps_num < 1 or fps_den < 1:
        raise ValueError("Y4M header has non-positive frame rate")
    plane = _y4m_frame_bytes(width, height, colorspace)
    frames: list[bytes] = []
    pos = nl + 1
    while pos < len(data):
        fnl = data.find(b"\n", pos)
        if fnl < 0 or data[pos : pos + 5] != b"FRAME":
            raise ValueError("malformed Y4M: expected FRAME marker")
        body = data[fnl + 1 : fnl + 1 + plane]
        if len(body) != plane:
            raise ValueError("truncated Y4M frame")
        frames.append(body)
        pos = fnl + 1 + plane
    if not frames:
        raise ValueError("Y4M stream contains no frames")
    return width, height, fps_num, fps_den, colorspace, frames


def encode_avi_mjpeg(
    width: int,
    height: int,
    fps_num: int,
    fps_den: int,
    frames: list[bytes],
    channels: int = 3,
) -> bytes:
    """Minimal stdlib AVI/MJPEG writer — each frame is a standalone
    baseline JPEG (:func:`encode_jpeg`) inside a RIFF 'AVI ' container
    (hdrl/avih + strl/strh'vids'/strf + movi/00dc chunks) — the
    fixture / round-trip counterpart of :func:`decode_avi_mjpeg`.
    ``frames`` are raw interleaved pixel buffers."""
    jpegs = [encode_jpeg(width, height, channels, f) for f in frames]

    def chunk(fourcc: bytes, body: bytes) -> bytes:
        pad = b"\x00" if len(body) % 2 else b""
        return fourcc + struct.pack("<I", len(body)) + body + pad

    def lst(fourcc: bytes, body: bytes) -> bytes:
        return chunk(b"LIST", fourcc + body)

    usec = max(1, round(1_000_000 * fps_den / fps_num))
    avih = struct.pack(
        "<14I", usec, 0, 0, 0, len(frames), 0, 1, 0, width, height,
        0, 0, 0, 0,
    )
    strh = (
        b"vids" + b"MJPG"
        + struct.pack("<3I", 0, 0, 0)  # flags, prio/lang, initial frames
        + struct.pack(
            # dwScale, dwRate, dwStart, dwLength, dwSuggestedBufferSize,
            # dwQuality, dwSampleSize — the 56-byte AVISTREAMHEADER
            "<7I", fps_den, fps_num, 0, len(frames), 0, 0xFFFFFFFF, 0
        )
        + struct.pack("<4h", 0, 0, width, height)
    )
    strf = struct.pack(
        "<I2i2H", 40, width, height, 1, 8 * channels
    ) + b"MJPG" + struct.pack("<I2i2I", width * height * channels, 0, 0, 0, 0)
    hdrl = lst(
        b"hdrl",
        chunk(b"avih", avih) + lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)),
    )
    movi = lst(b"movi", b"".join(chunk(b"00dc", j) for j in jpegs))
    return chunk(b"RIFF", b"AVI " + hdrl + movi)


def decode_avi_mjpeg(
    data: bytes,
) -> tuple[int, int, int, int, list[tuple[int, bytes]]]:
    """Pure-stdlib AVI/MJPEG parser: walk the RIFF chunk tree, read the
    frame rate from the 'vids' stream header (dwRate/dwScale — falling
    back to avih's dwMicroSecPerFrame), collect the movi '..dc'/'..db'
    frame chunks, and decode each as a standalone baseline JPEG through
    the shared :func:`decode_jpeg` kernel. Returns ``(width, height,
    fps_num, fps_den, frames)`` with each frame ``(channels, pixels)``
    row-major interleaved; geometry must agree across frames and with
    the header. MJPEG is the one COMPRESSED video container stdlib-only
    decode can honestly cover, because it is exactly JPEG-per-frame;
    inter-frame codecs (H.264/VP9/AV1) remain out of scope. Corrupt
    input raises ``ValueError`` — fail loudly, never garbage features
    (the shared decoder contract)."""
    if len(data) < 12 or data[:4] != b"RIFF" or data[8:12] != b"AVI ":
        raise ValueError("not an AVI: bad RIFF signature")
    fps_num, fps_den = None, None
    usec = None
    hdr_w = hdr_h = None
    jpegs: list[bytes] = []

    def walk(buf: bytes, pos: int, end: int) -> None:
        nonlocal fps_num, fps_den, usec, hdr_w, hdr_h
        while pos + 8 <= end:
            fourcc = buf[pos : pos + 4]
            (size,) = struct.unpack("<I", buf[pos + 4 : pos + 8])
            body_end = pos + 8 + size
            if body_end > end:
                raise ValueError("truncated AVI chunk")
            if fourcc == b"LIST":
                walk(buf, pos + 12, body_end)
            elif fourcc == b"avih" and size >= 40:
                vals = struct.unpack("<10I", buf[pos + 8 : pos + 48])
                usec, hdr_w, hdr_h = vals[0], vals[8], vals[9]
            elif fourcc == b"strh" and size >= 44:
                if buf[pos + 8 : pos + 12] == b"vids":
                    scale, rate = struct.unpack(
                        "<2I", buf[pos + 28 : pos + 36]
                    )
                    if rate and scale:
                        fps_num, fps_den = rate, scale
            elif fourcc[2:4] in (b"dc", b"db") and size > 0:
                jpegs.append(buf[pos + 8 : body_end])
            pos = body_end + (size % 2)  # chunks are word-aligned

    walk(data, 12, len(data))
    if not jpegs:
        raise ValueError("AVI stream contains no video frame chunks")
    if fps_num is None:
        if not usec:
            raise ValueError("AVI has neither a vids strh nor avih timing")
        fps_num, fps_den = 1_000_000, usec
    frames: list[tuple[int, bytes]] = []
    width = height = None
    for j in jpegs:
        w, h, c, px = decode_jpeg(j)
        if width is None:
            width, height = w, h
        elif (w, h) != (width, height):
            raise ValueError("AVI MJPEG frames disagree on geometry")
        frames.append((c, bytes(px)))
    if hdr_w and hdr_h and (hdr_w, hdr_h) != (width, height):
        raise ValueError("AVI header geometry disagrees with frame JPEGs")
    return width, height, fps_num, fps_den, frames


def _rgb_luma(channels: int, pixels: bytes) -> bytes:
    """Rec.601 integer luma from an interleaved frame (grayscale passes
    through) — exact integer math, deterministic everywhere."""
    if channels == 1:
        return pixels
    return bytes(
        (299 * pixels[i] + 587 * pixels[i + 1] + 114 * pixels[i + 2] + 500)
        // 1000
        for i in range(0, len(pixels), channels)
    )


def video_features(payload: bytes) -> list[float]:
    """8-dim feature vector from REAL decoded video (same shape
    contract as :func:`png_features` / :func:`wav_features`): geometry,
    frame count, duration, then luma statistics — mean level, peak,
    mean absolute TEMPORAL difference (a motion-energy proxy: 0 for a
    static clip), and luma dynamic range. Dispatches on the container
    signature: uncompressed YUV4MPEG2 (:func:`decode_y4m`, luma = the
    Y plane) or AVI/MJPEG (:func:`decode_avi_mjpeg`, luma via exact
    Rec.601 integers). All statistics are exact integer sums over the
    luma plane before one float division, so the output is
    deterministic across partitionings."""
    import math

    if payload[:4] == b"RIFF" and payload[8:12] == b"AVI ":
        width, height, fps_num, fps_den, dec = decode_avi_mjpeg(payload)
        luma = [_rgb_luma(c, px) for c, px in dec]
    else:
        width, height, fps_num, fps_den, _cs, frames = decode_y4m(payload)
        n_px = width * height
        luma = [f[:n_px] for f in frames]  # chroma never enters the stats
    n_px = width * height
    total = sum(sum(p) for p in luma)
    peak = max(max(p) for p in luma)
    lo = min(min(p) for p in luma)
    motion = 0
    for prev, cur in zip(luma, luma[1:]):
        motion += sum(abs(a - b) for a, b in zip(prev, cur))
    n_motion = n_px * max(1, len(luma) - 1)
    return [
        math.log1p(width),
        math.log1p(height),
        math.log1p(len(luma)),
        len(luma) * fps_den / fps_num,
        total / (len(luma) * n_px) / 255.0,
        peak / 255.0,
        motion / n_motion / 255.0,
        (peak - lo) / 255.0,
    ]


MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image|audio|video
        T.StructField("payload", T.BinaryType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("width", T.IntegerType()),
                    T.StructField("height", T.IntegerType()),
                    T.StructField("sample_rate", T.IntegerType()),
                    T.StructField("n_frames", T.IntegerType()),
                    T.StructField("mime", T.StringType()),
                ]
            ),
        ),
    ]
)

# --------------------------------------------------------------------------
# Baseline JPEG (ITU-T T.81): pure-stdlib Huffman + IDCT decode, plus the
# fixture-generating encoder — retires the round-6 "compressed codecs out
# of scope" caveat for still images. Progressive (SOF2) / arithmetic /
# 12-bit stay out of scope and raise loudly.
# --------------------------------------------------------------------------

#: zigzag index -> raster position within an 8x8 block (T.81 Figure 5)
_ZIGZAG = [
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
]

#: Annex K quantization tables (raster order) — ENCODER defaults only;
#: the decoder always reads tables from the file's DQT segments.
_QTAB_LUMA = [
    16, 11, 10, 16, 24, 40, 51, 61, 12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56, 14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77, 24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101, 72, 92, 95, 98, 112, 100, 103, 99,
]
_QTAB_CHROMA = [
    17, 18, 24, 47, 99, 99, 99, 99, 18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99, 47, 66, 99, 99, 99, 99, 99, 99,
] + [99] * 32

#: Annex K typical Huffman tables (bits[1..16], values) — encoder side.
_HUFF_DC_LUMA = (
    [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
    list(range(12)),
)
_HUFF_DC_CHROMA = (
    [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
    list(range(12)),
)
_HUFF_AC_LUMA = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D],
    [
        0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
        0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
        0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
        0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
        0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
        0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
        0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
        0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
        0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
        0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
        0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
        0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
        0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
        0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
        0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
    ],
)
_HUFF_AC_CHROMA = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77],
    [
        0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12,
        0x41, 0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14,
        0x42, 0x91, 0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15,
        0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17,
        0x18, 0x19, 0x1A, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37,
        0x38, 0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A,
        0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65,
        0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
        0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A,
        0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
        0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5,
        0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
        0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9,
        0xDA, 0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2,
        0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
    ],
)


def _huff_decode_table(bits: list[int], vals: list[int]) -> dict:
    """(code_length, code) -> symbol, canonical JPEG code assignment."""
    table, code, k = {}, 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            table[(length, code)] = vals[k]
            k += 1
            code += 1
        code <<= 1
    return table


def _huff_encode_table(bits: list[int], vals: list[int]) -> dict:
    """symbol -> (code_length, code), same canonical assignment."""
    return {v: lc for lc, v in _huff_decode_table(bits, vals).items()}


import math as _math

_IDCT_COS = [
    [
        _math.cos((2 * x + 1) * u * _math.pi / 16)
        * (1.0 / _math.sqrt(2) if u == 0 else 1.0)
        for u in range(8)
    ]
    for x in range(8)
]


def _idct_8x8(coef: list[float]) -> list[float]:
    """Separable 2-D inverse DCT (T.81 A.3.3), rows then columns."""
    tmp = [0.0] * 64
    for y in range(8):
        row = coef[y * 8 : y * 8 + 8]
        for x in range(8):
            tmp[y * 8 + x] = 0.5 * sum(
                row[u] * _IDCT_COS[x][u] for u in range(8)
            )
    out = [0.0] * 64
    for x in range(8):
        col = [tmp[y * 8 + x] for y in range(8)]
        for y in range(8):
            out[y * 8 + x] = 0.5 * sum(
                col[v] * _IDCT_COS[y][v] for v in range(8)
            )
    return out


def _fdct_8x8(px: list[float]) -> list[float]:
    """Separable forward DCT — the encoder-side inverse of
    :func:`_idct_8x8` (fixture generation only)."""
    tmp = [0.0] * 64
    for y in range(8):
        row = px[y * 8 : y * 8 + 8]
        for u in range(8):
            tmp[y * 8 + u] = 0.5 * sum(
                row[x] * _IDCT_COS[x][u] for x in range(8)
            )
    out = [0.0] * 64
    for u in range(8):
        col = [tmp[y * 8 + u] for y in range(8)]
        for v in range(8):
            out[v * 8 + u] = 0.5 * sum(
                col[y] * _IDCT_COS[y][v] for y in range(8)
            )
    return out


class _BitReader:
    """Entropy-coded-segment bit reader: undoes 0xFF00 byte stuffing and
    consumes RSTn markers at restart boundaries."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.acc = 0
        self.n = 0

    def _next_byte(self) -> int:
        d = self.data
        if self.pos >= len(d):
            raise ValueError("truncated JPEG entropy stream")
        b = d[self.pos]
        self.pos += 1
        if b == 0xFF:
            if self.pos >= len(d):
                raise ValueError("truncated JPEG entropy stream")
            m = d[self.pos]
            if m == 0x00:
                self.pos += 1  # stuffed 0xFF data byte
            else:
                # a real marker mid-read: rewind so the caller sees it
                self.pos -= 1
                raise ValueError("unexpected marker inside entropy data")
        return b

    def bit(self) -> int:
        if self.n == 0:
            self.acc = self._next_byte()
            self.n = 8
        self.n -= 1
        return (self.acc >> self.n) & 1

    def bits(self, k: int) -> int:
        v = 0
        for _ in range(k):
            v = (v << 1) | self.bit()
        return v

    def huff(self, table: dict) -> int:
        length, code = 0, 0
        while length < 16:
            code = (code << 1) | self.bit()
            length += 1
            sym = table.get((length, code))
            if sym is not None:
                return sym
        raise ValueError("invalid JPEG Huffman code")

    def restart(self, expect: int) -> None:
        """Byte-align and consume the RSTn marker at a restart boundary."""
        self.n = 0
        d = self.data
        if d[self.pos : self.pos + 1] != b"\xff":
            raise ValueError("missing JPEG restart marker")
        m = d[self.pos + 1]
        if m != 0xD0 + (expect & 7):
            raise ValueError("JPEG restart marker out of sequence")
        self.pos += 2


def _receive_extend(v: int, t: int) -> int:
    """T.81 EXTEND: map a t-bit magnitude to its signed value."""
    return v if v >= (1 << (t - 1)) else v - (1 << t) + 1


def decode_jpeg(data: bytes) -> tuple[int, int, int, bytearray]:
    """Decode a BASELINE (SOF0, 8-bit, Huffman) JPEG with nothing but
    the stdlib: marker walk, DQT/DHT table loads (tables always come
    from the FILE, not the Annex K defaults), per-MCU Huffman decode,
    dequantize + zigzag + IDCT, chroma upsampling for any (h,v)
    sampling (4:4:4 / 4:2:0 / 4:2:2 all reduce to the generic path),
    JFIF YCbCr→RGB with clamping, DRI/RSTn restart-interval support.

    Returns ``(width, height, channels, pixels)`` row-major interleaved,
    matching :func:`decode_png`'s contract (1 channel for grayscale, 3
    for YCbCr). Progressive (SOF2), arithmetic coding, 12-bit precision
    and hierarchical modes raise ``ValueError`` — fail loudly, never
    garbage features (the shared decoder contract)."""
    if data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG: bad SOI marker")
    pos = 2
    qtabs: dict[int, list[int]] = {}
    htabs: dict[tuple[int, int], dict] = {}  # (class, id) -> decode table
    frame = None  # (width, height, [(cid, h, v, tq)])
    restart_interval = 0
    while pos + 4 <= len(data):
        if data[pos] != 0xFF:
            raise ValueError("JPEG marker sync lost")
        # T.81 B.1.1.2: any marker may be preceded by any number of
        # 0xFF fill bytes — skip them so the fill byte is never read as
        # the marker code itself (round-7 ADVICE low)
        while pos + 1 < len(data) and data[pos + 1] == 0xFF:
            pos += 1
        if pos + 4 > len(data):
            break
        marker = data[pos + 1]
        pos += 2
        if marker == 0xD9:  # EOI
            break
        (seglen,) = struct.unpack(">H", data[pos : pos + 2])
        seg = data[pos + 2 : pos + seglen]
        if pos + seglen > len(data):
            raise ValueError("truncated JPEG segment")
        if marker == 0xDB:  # DQT
            p = 0
            while p < len(seg):
                pq, tq = seg[p] >> 4, seg[p] & 0x0F
                if pq != 0:
                    raise ValueError("16-bit quant tables unsupported")
                zz = list(seg[p + 1 : p + 65])
                if len(zz) != 64:
                    raise ValueError("truncated JPEG DQT segment")
                tab = [0] * 64
                for i, q in enumerate(zz):
                    tab[_ZIGZAG[i]] = q
                qtabs[tq] = tab
                p += 65
        elif marker == 0xC4:  # DHT
            p = 0
            while p < len(seg):
                tc, th = seg[p] >> 4, seg[p] & 0x0F
                bits = list(seg[p + 1 : p + 17])
                n = sum(bits)
                vals = list(seg[p + 17 : p + 17 + n])
                if len(bits) != 16 or len(vals) != n:
                    raise ValueError("truncated JPEG DHT segment")
                htabs[(tc, th)] = _huff_decode_table(bits, vals)
                p += 17 + n
        elif marker == 0xC0:  # SOF0 baseline
            prec, h, w, nc = struct.unpack(">BHHB", seg[:6])
            if prec != 8:
                raise ValueError("only 8-bit JPEG precision supported")
            comps = []
            for c in range(nc):
                cid, hv, tq = seg[6 + 3 * c : 9 + 3 * c]
                comps.append((cid, hv >> 4, hv & 0x0F, tq))
            frame = (w, h, comps)
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA,
                        0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError(
                "non-baseline JPEG (progressive/arithmetic/hierarchical) "
                "unsupported"
            )
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack(">H", seg[:2])
        elif marker == 0xDA:  # SOS — entropy data follows
            if frame is None:
                raise ValueError("JPEG SOS before SOF0")
            ns = seg[0]
            scomp = []
            for c in range(ns):
                cs, tdta = seg[1 + 2 * c], seg[2 + 2 * c]
                scomp.append((cs, tdta >> 4, tdta & 0x0F))
            return _decode_scan(
                data, pos + seglen, frame, scomp, qtabs, htabs,
                restart_interval,
            )
        # APPn/COM/other: skipped
        pos += seglen
    raise ValueError("JPEG has no SOS scan")


def _decode_scan(data, pos, frame, scomp, qtabs, htabs, ri):
    width, height, comps = frame
    if len(scomp) != len(comps) or len(comps) not in (1, 3):
        raise ValueError("unsupported JPEG component layout")
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcux = (width + 8 * hmax - 1) // (8 * hmax)
    mcuy = (height + 8 * vmax - 1) // (8 * vmax)
    by_id = {c[0]: c for c in comps}
    planes, pw = [], []
    order = []  # (plane_idx, h, v, qtab, dctab, actab)
    for cs, td, ta in scomp:
        cid, h, v, tq = by_id[cs]
        w_c, h_c = mcux * h * 8, mcuy * v * 8
        planes.append(bytearray(w_c * h_c))
        pw.append((w_c, h_c, h, v))
        order.append(
            (len(planes) - 1, h, v, qtabs[tq], htabs[(0, td)], htabs[(1, ta)])
        )
    rd = _BitReader(data, pos)
    preds = [0] * len(order)
    n_mcu = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if ri and n_mcu and n_mcu % ri == 0:
                rd.restart(n_mcu // ri - 1)
                preds = [0] * len(order)
            for oi, (pi, h, v, qt, dct, act) in enumerate(order):
                for by in range(v):
                    for bx in range(h):
                        coef = [0.0] * 64
                        t = rd.huff(dct)
                        diff = _receive_extend(rd.bits(t), t) if t else 0
                        preds[oi] += diff
                        coef[0] = preds[oi] * qt[0]
                        k = 1
                        while k < 64:
                            rs = rd.huff(act)
                            r, s = rs >> 4, rs & 0x0F
                            if s == 0:
                                if r == 15:
                                    k += 16  # ZRL
                                    continue
                                break  # EOB
                            k += r
                            if k > 63:
                                raise ValueError("JPEG AC index overflow")
                            zz = _ZIGZAG[k]
                            coef[zz] = (
                                _receive_extend(rd.bits(s), s) * qt[zz]
                            )
                            k += 1
                        px = _idct_8x8(coef)
                        w_c = pw[pi][0]
                        ox = (mx * h + bx) * 8
                        oy = (my * v + by) * 8
                        plane = planes[pi]
                        for y in range(8):
                            base = (oy + y) * w_c + ox
                            for x in range(8):
                                val = int(px[y * 8 + x] + 128.5)
                                plane[base + x] = (
                                    0 if val < 0 else 255 if val > 255 else val
                                )
            n_mcu += 1
    if len(comps) == 1:
        w_c = pw[0][0]
        out = bytearray(width * height)
        for y in range(height):
            out[y * width : (y + 1) * width] = planes[0][
                y * w_c : y * w_c + width
            ]
        return width, height, 1, out
    out = bytearray(width * height * 3)
    for y in range(height):
        for x in range(width):
            svals = []
            for pi in range(3):
                w_c, _h_c, h, v = pw[pi]
                svals.append(
                    planes[pi][(y * v // vmax) * w_c + (x * h // hmax)]
                )
            yy, cb, cr = svals
            r = yy + 1.402 * (cr - 128)
            g = yy - 0.344136 * (cb - 128) - 0.714136 * (cr - 128)
            b = yy + 1.772 * (cb - 128)
            o = (y * width + x) * 3
            out[o] = 0 if r < 0 else 255 if r > 255 else int(r + 0.5)
            out[o + 1] = 0 if g < 0 else 255 if g > 255 else int(g + 0.5)
            out[o + 2] = 0 if b < 0 else 255 if b > 255 else int(b + 0.5)
    return width, height, 3, out


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, code: int, length: int) -> None:
        for i in range(length - 1, -1, -1):
            self.acc = (self.acc << 1) | ((code >> i) & 1)
            self.n += 1
            if self.n == 8:
                self.out.append(self.acc)
                if self.acc == 0xFF:
                    self.out.append(0x00)  # byte stuffing
                self.acc, self.n = 0, 0

    def flush(self) -> None:
        while self.n:  # pad with 1-bits per T.81 F.1.2.3
            self.write(1, 1)


def encode_jpeg(
    width: int, height: int, channels: int, pixels: bytes
) -> bytes:
    """Minimal stdlib BASELINE JPEG encoder (4:4:4, Annex K quant +
    Huffman tables) — the fixture / round-trip counterpart of
    :func:`decode_jpeg`, exactly as :func:`encode_png` is for
    :func:`decode_png`. Grayscale (1 channel) or RGB (3 channels)."""
    if channels not in (1, 3):
        raise ValueError("encode_jpeg supports 1 or 3 channels")
    # component planes, level-shifted to [-128, 127]
    if channels == 1:
        planes = [[float(p) - 128.0 for p in pixels]]
    else:
        ys, cbs, crs = [], [], []
        for i in range(0, len(pixels), 3):
            r, g, b = pixels[i], pixels[i + 1], pixels[i + 2]
            ys.append(0.299 * r + 0.587 * g + 0.114 * b - 128.0)
            cbs.append(-0.168736 * r - 0.331264 * g + 0.5 * b)
            crs.append(0.5 * r - 0.418688 * g - 0.081312 * b)
        planes = [ys, cbs, crs]
    bw, bh = (width + 7) // 8 * 8, (height + 7) // 8 * 8
    enc_dc = [
        _huff_encode_table(*_HUFF_DC_LUMA),
        _huff_encode_table(*_HUFF_DC_CHROMA),
    ]
    enc_ac = [
        _huff_encode_table(*_HUFF_AC_LUMA),
        _huff_encode_table(*_HUFF_AC_CHROMA),
    ]
    qt = [_QTAB_LUMA, _QTAB_CHROMA]

    def cat(v: int) -> int:
        t, a = 0, abs(v)
        while a:
            a >>= 1
            t += 1
        return t

    w = _BitWriter()
    preds = [0] * channels
    for my in range(0, bh, 8):
        for mx in range(0, bw, 8):
            for ci, plane in enumerate(planes):
                tid = 0 if ci == 0 else 1
                block = []
                for y in range(8):
                    sy = min(my + y, height - 1)
                    for x in range(8):
                        sx = min(mx + x, width - 1)
                        block.append(plane[sy * width + sx])
                coef = _fdct_8x8(block)
                q = [
                    int(round(coef[i] / qt[tid][i])) for i in range(64)
                ]
                diff = q[0] - preds[ci]
                preds[ci] = q[0]
                t = cat(diff)
                length, code = enc_dc[tid][t]
                w.write(code, length)
                if t:
                    w.write(diff if diff >= 0 else diff + (1 << t) - 1, t)
                run = 0
                for k in range(1, 64):
                    v = q[_ZIGZAG[k]]
                    if v == 0:
                        run += 1
                        continue
                    while run > 15:
                        length, code = enc_ac[tid][0xF0]  # ZRL
                        w.write(code, length)
                        run -= 16
                    s = cat(v)
                    length, code = enc_ac[tid][(run << 4) | s]
                    w.write(code, length)
                    w.write(v if v >= 0 else v + (1 << s) - 1, s)
                    run = 0
                if run:
                    length, code = enc_ac[tid][0x00]  # EOB
                    w.write(code, length)
    w.flush()

    def seg(marker: int, body: bytes) -> bytes:
        return bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2) + body

    def dqt(tid: int, tab: list[int]) -> bytes:
        zz = bytes(tab[_ZIGZAG[i]] for i in range(64))
        return seg(0xDB, bytes([tid]) + zz)

    def dht(tc: int, th: int, bits: list[int], vals: list[int]) -> bytes:
        return seg(
            0xC4, bytes([(tc << 4) | th]) + bytes(bits) + bytes(vals)
        )

    ncomp = channels
    sof_body = struct.pack(">BHHB", 8, height, width, ncomp)
    sos_body = bytes([ncomp])
    for c in range(ncomp):
        tid = 0 if c == 0 else 1
        sof_body += bytes([c + 1, 0x11, tid])  # h=v=1 (4:4:4)
        sos_body += bytes([c + 1, (tid << 4) | tid])
    sos_body += bytes([0, 63, 0])
    out = bytearray(b"\xff\xd8")  # SOI
    out += dqt(0, _QTAB_LUMA)
    if ncomp == 3:
        out += dqt(1, _QTAB_CHROMA)
    out += seg(0xC0, sof_body)
    out += dht(0, 0, *_HUFF_DC_LUMA)
    out += dht(1, 0, *_HUFF_AC_LUMA)
    if ncomp == 3:
        out += dht(0, 1, *_HUFF_DC_CHROMA)
        out += dht(1, 1, *_HUFF_AC_CHROMA)
    out += seg(0xDA, sos_body)
    out += w.out
    out += b"\xff\xd9"  # EOI
    return bytes(out)


def image_features(payload: bytes) -> list[float]:
    """Signature-dispatched image feature extraction: PNG via
    :func:`decode_png`, baseline JPEG via :func:`decode_jpeg`, same
    8-dim output contract either way."""
    if payload[:8] == _PNG_SIGNATURE:
        return png_features(payload)
    if payload[:2] == b"\xff\xd8":
        return _pixel_features(*decode_jpeg(payload))
    raise ValueError("unknown image container (not PNG or JPEG)")


# feat is array<double>: the fake decoder emits d/255.0 in float64, and the
# DuckDB oracle computes the identical IEEE-double division — float32 would
# perturb the 9-significant-digit comparison.
FEATURE_SCHEMA = (
    "media_id bigint, kind string, n_bytes int, digest string, "
    "feat array<double>"
)


def synthetic_media(spark: SparkSession, n: int = 64) -> DataFrame:
    """Deterministic fake corpus for tests (payload = repeated digest
    bytes, metadata consistent with `kind`)."""
    rows = []
    for i in range(n):
        kind = ["image", "audio", "video"][i % 3]
        payload = hashlib.md5(str(i).encode()).digest() * (i % 7 + 1)
        meta = {
            "width": 64 + i if kind != "audio" else None,
            "height": 48 + i if kind != "audio" else None,
            "sample_rate": 16000 if kind == "audio" else None,
            "n_frames": i % 30 + 1 if kind == "video" else None,
            "mime": {"image": "image/png", "audio": "audio/wav", "video": "video/mp4"}[kind],
        }
        rows.append((i, kind, payload, meta))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def extract_features(media: DataFrame, fake: bool = True) -> DataFrame:
    """Decode + feature-extract via mapInPandas (Arrow-batched).

    ``fake=True``: deterministic 8-dim feature from the payload digest —
    exercises the full distributed path (schema, batching, null payloads)
    and is engine-portable for the DuckDB oracle. ``fake=False`` decodes
    REAL payloads for all three kinds, stdlib-only: PNG and baseline
    JPEG images (:func:`image_features` dispatches on the container
    signature → :func:`decode_png` / :func:`decode_jpeg`), PCM WAV audio
    (:func:`decode_wav` → :func:`wav_features`), and video —
    uncompressed YUV4MPEG2 or AVI/MJPEG, signature-dispatched inside
    :func:`video_features` (:func:`decode_y4m` / :func:`decode_avi_mjpeg`).
    Inter-frame video codecs (H.264/VP9 — ffmpeg territory) and
    progressive/arithmetic JPEG are out of scope; corrupt payloads of
    any kind raise rather than yielding garbage features.
    """

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats, digests, sizes = [], [], []
            for payload, kind in zip(pdf["payload"], pdf["kind"]):
                if payload is None:
                    digests.append(None)
                    sizes.append(0)
                    feats.append(None)
                    continue
                payload = bytes(payload)
                d = hashlib.md5(payload).hexdigest()
                digests.append(d)
                sizes.append(len(payload))
                if fake:
                    feats.append(
                        [int(d[j : j + 2], 16) / 255.0 for j in range(0, 16, 2)]
                    )
                elif kind == "image":
                    feats.append(image_features(payload))
                elif kind == "audio":
                    feats.append(wav_features(payload))
                elif kind == "video":
                    feats.append(video_features(payload))
                else:
                    raise ValueError(f"unknown media kind {kind!r}")
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": sizes,
                    "digest": digests,
                    "feat": feats,
                }
            )

    # The Python kernel is the per-core bottleneck: if the scan arrives
    # under-partitioned (small corpus = few files), fan out to the session
    # default parallelism so every core hosts a worker. At scale the scan
    # already has >= parallelism partitions and this is a no-op (no
    # shuffle is ever added for the big-corpus case).
    sc = media.sparkSession.sparkContext
    target = sc.defaultParallelism
    if media.rdd.getNumPartitions() < target:
        media = media.repartition(target)
    return media.mapInPandas(kernel, FEATURE_SCHEMA)


def resize_plan(media: DataFrame, max_side: int = 256) -> DataFrame:
    """The resize operator's *plan* side: computes target dims from
    metadata JVM-side (no Python), so only rows actually needing decode
    reach the UDF — the predicate-pushdown pattern for media pipelines."""
    needs = (F.col("meta.width") > max_side) | (F.col("meta.height") > max_side)
    scale = F.least(
        F.lit(max_side) / F.col("meta.width"),
        F.lit(max_side) / F.col("meta.height"),
    )
    return media.withColumn("needs_resize", F.coalesce(needs, F.lit(False))).withColumn(
        "target_width",
        F.when(needs, F.floor(F.col("meta.width") * scale)).otherwise(
            F.col("meta.width")
        ).cast("int"),
    ).withColumn(
        "target_height",
        F.when(needs, F.floor(F.col("meta.height") * scale)).otherwise(
            F.col("meta.height")
        ).cast("int"),
    )


def sample_frames(media: DataFrame, every_n: int = 5) -> DataFrame:
    """Frame-sampling plan for video rows: one output row per selected
    frame index, produced by sequence+explode JVM-side; decoding the
    selected frames is the kernel above (real for Y4M payloads)."""
    return (
        media.filter(F.col("kind") == "video")
        .withColumn(
            "frame_idx",
            F.explode(
                F.sequence(
                    F.lit(0), F.coalesce(F.col("meta.n_frames"), F.lit(1)) - 1,
                    F.lit(every_n),
                )
            ),
        )
        .select("media_id", "frame_idx", "meta")
    )
