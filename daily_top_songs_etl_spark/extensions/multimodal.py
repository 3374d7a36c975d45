"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video ride as ``binary`` columns with a metadata struct; the
Spark-side contract (schema, partition sizing, Arrow batch shape, UDF
signatures) is real and tested. Image decode is REAL for PNG — a
pure-stdlib decoder (zlib inflate + per-scanline unfilter + palette
expansion, :func:`decode_png`) runs inside the Arrow kernel, so
``fake=False`` extracts features from actual pixel data with no external
codec dependency. Audio decode is REAL for PCM WAV — a pure-stdlib
RIFF/fmt/data parser (:func:`decode_wav`) feeds amplitude statistics
(:func:`wav_features`). Video decode is REAL for uncompressed YUV4MPEG2
— a pure-stdlib header + FRAME-plane parser (:func:`decode_y4m`) feeds
luma/motion statistics (:func:`video_features`); compressed codecs
(H.264/VP9 — ffmpeg territory) are documented out of scope. The
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
    """8-dim feature vector from REAL decoded pixels: log-scaled dims,
    channel count, per-channel means (missing channels 0.0) and overall
    pixel mean — all plain float64 arithmetic over exact byte sums."""
    import math

    width, height, channels, px = decode_png(payload)
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


def video_features(payload: bytes) -> list[float]:
    """8-dim feature vector from REAL decoded Y4M video (same shape
    contract as :func:`png_features` / :func:`wav_features`): geometry,
    frame count, duration, then luma statistics — mean level, peak,
    mean absolute TEMPORAL difference (a motion-energy proxy: 0 for a
    static clip), and luma dynamic range. All statistics are exact
    integer sums over the luma plane before one float division, so the
    output is deterministic across partitionings."""
    import math

    width, height, fps_num, fps_den, _cs, frames = decode_y4m(payload)
    n_px = width * height
    luma = [f[:n_px] for f in frames]  # chroma never enters the stats
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
        math.log1p(len(frames)),
        len(frames) * fps_den / fps_num,
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
    REAL payloads for all three kinds, stdlib-only: PNG images
    (:func:`decode_png` → :func:`png_features`), PCM WAV audio
    (:func:`decode_wav` → :func:`wav_features`), and uncompressed
    YUV4MPEG2 video (:func:`decode_y4m` → :func:`video_features`).
    Compressed video codecs (H.264/VP9 — ffmpeg territory) are out of
    scope; corrupt payloads of any kind raise rather than yielding
    garbage features.
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
                    feats.append(png_features(payload))
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
