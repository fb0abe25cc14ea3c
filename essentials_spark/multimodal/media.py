"""Multimodal (image/audio/video) columns as opaque binary + metadata.

The Spark-side plumbing — schema, partition-sized Arrow batching,
mapInPandas signatures, feature-column contracts — is real and tested,
and so are the codecs for UNCOMPRESSED container formats, implemented
in pure NumPy (no external media libraries in this container):

- PPM (P6)            -> (h, w, 3) uint8 pixels
- BMP (24-bit, BI_RGB) -> (h, w, 3) uint8 pixels (bottom-up + BGR handled)
- WAV (PCM 8/16-bit)   -> float64 mono samples + sample rate
- PNG (8/16-bit, gray/RGB/RGBA/palette, non-interlaced AND Adam7
  interlaced) -> uint8/uint16 pixels (stdlib zlib inflate + NumPy
  scanline unfiltering — a REAL compressed format with no external
  dependency)

Remaining compressed formats (JPEG/MP3/H.264, sub-byte-depth
PNG) still raise ``NotImplementedError`` — swapping in PIL/ffmpeg
changes one dispatch branch, not the pipeline. The synthetic
octet-stream payloads used by the contract tests keep a clearly-marked
deterministic fake.

Design for 100 TB: binaries stay in their parquet row groups until the
mapInPandas stage; decode/feature-extract run per Arrow batch
(spark.sql.execution.arrow.maxRecordsPerBatch caps batch memory);
per-object decode is the codec bound, every feature pass is one
vectorized sweep over the whole batch; nothing reaches the driver.
"""

from __future__ import annotations

from typing import Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "media_id long, kind string, payload binary, mime string, "
    "width int, height int, duration_ms int"
)

FEATURE_SCHEMA = "media_id long, kind string, n_bytes long, mean_byte double, feature array<float>"

AUDIO_SCHEMA = (
    "media_id long, n_samples long, sample_rate int, rms double, feature array<float>"
)


def synth_media(spark: SparkSession, n: int = 100, seed: int = 42) -> DataFrame:
    """Deterministic fake media table (payload = seeded bytes)."""
    kinds = F.element_at(
        F.array(F.lit("image"), F.lit("audio"), F.lit("video")), (F.col("id") % 3 + 1).cast("int")
    )
    payload = F.sha2(F.concat(F.lit(str(seed)), F.col("id").cast("string")), 512).cast("binary")
    return spark.range(n).select(
        F.col("id").alias("media_id"),
        kinds.alias("kind"),
        payload.alias("payload"),
        F.lit("application/octet-stream").alias("mime"),
        (F.col("id") % 64 + 16).cast("int").alias("width"),
        (F.col("id") % 48 + 16).cast("int").alias("height"),
        (F.col("id") * 100 % 60000).cast("int").alias("duration_ms"),
    )


# --------------------------------------------------------------- real codecs


def decode_ppm(payload: bytes):
    """Binary PPM (P6): header 'P6 <w> <h> <maxval>' + raw RGB bytes.
    Returns (h, w, 3) uint8. Comments (#...) in the header are handled."""
    import numpy as np

    if payload[:2] != b"P6":
        raise ValueError("not a P6 PPM payload")
    # tokenize the header: 3 integers after the magic, skipping comments
    pos, vals = 2, []
    while len(vals) < 3:
        while pos < len(payload) and payload[pos : pos + 1].isspace():
            pos += 1
        if payload[pos : pos + 1] == b"#":
            while pos < len(payload) and payload[pos] != 0x0A:
                pos += 1
            continue
        start = pos
        while pos < len(payload) and not payload[pos : pos + 1].isspace():
            pos += 1
        vals.append(int(payload[start:pos]))
    pos += 1  # single whitespace after maxval
    w, h, maxval = vals
    if maxval > 255:
        raise NotImplementedError("16-bit PPM not supported")
    return np.frombuffer(payload, dtype=np.uint8, count=w * h * 3, offset=pos).reshape(h, w, 3)


def decode_bmp(payload: bytes):
    """Uncompressed 24-bit BMP (BI_RGB). Returns (h, w, 3) uint8 in RGB
    order, top-down (bottom-up storage and row padding handled)."""
    import numpy as np

    if payload[:2] != b"BM":
        raise ValueError("not a BMP payload")
    off = int.from_bytes(payload[10:14], "little")
    w = int.from_bytes(payload[18:22], "little", signed=True)
    h = int.from_bytes(payload[22:26], "little", signed=True)
    bpp = int.from_bytes(payload[28:30], "little")
    compression = int.from_bytes(payload[30:34], "little")
    if bpp != 24 or compression != 0:
        raise NotImplementedError("only uncompressed 24-bit BMP is supported without PIL")
    stride = (w * 3 + 3) // 4 * 4  # rows pad to 4 bytes
    rows = abs(h)
    arr = (
        np.frombuffer(payload, dtype=np.uint8, count=stride * rows, offset=off)
        .reshape(rows, stride)[:, : w * 3]
        .reshape(rows, w, 3)
    )
    if h > 0:  # positive height = bottom-up storage
        arr = arr[::-1]
    return arr[..., ::-1]  # BGR -> RGB


# Adam7 interlace pass grid: (x_start, y_start, x_step, y_step) —
# PNG spec §8.2; pass sub-images are filtered independently
_ADAM7 = [
    (0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
    (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2),
]


def _png_unfilter(raw, h: int, stride: int, bpp: int):
    """Invert PNG scanline filters over one (sub-)image's bytes.

    ``raw``: h*(stride+1) filter-prefixed scanline bytes; ``bpp`` is
    bytes per pixel (filters operate on BYTES at any bit depth — the
    byte ``bpp`` to the left is the 'prior pixel', spec §9.2).
    Filter 1 (sub) is a mod-256 prefix sum along the row
    (np.add.accumulate on uint8); filter 2 (up) is one vectorized add
    of the previous row; filters 3/4 (average/paeth) carry an in-row
    dependency, computed as a per-pixel sweep vectorized across the
    pixel's byte lanes. Returns (h, stride) uint8."""
    import numpy as np

    if raw.size != h * (stride + 1):
        raise ValueError("PNG scanline size mismatch")
    rows = raw.reshape(h, stride + 1)
    filters = rows[:, 0]
    out = np.zeros((h, stride), dtype=np.uint8)
    for y in range(h):
        f = filters[y]
        cur = rows[y, 1:].copy()
        prev = out[y - 1] if y > 0 else np.zeros(stride, dtype=np.uint8)
        if f == 0:
            out[y] = cur
        elif f == 1:  # sub: mod-256 prefix sum per byte lane
            lanes = cur.reshape(stride // bpp, bpp)
            out[y] = np.add.accumulate(lanes, axis=0, dtype=np.uint8).ravel()
        elif f == 2:  # up
            out[y] = cur + prev
        elif f == 3:  # average (in-row dependency: sweep pixels)
            o = out[y]
            o[:bpp] = cur[:bpp] + (prev[:bpp] // 2)
            for i in range(bpp, stride, bpp):
                a = o[i - bpp : i].astype(np.uint16)
                b = prev[i : i + bpp].astype(np.uint16)
                o[i : i + bpp] = cur[i : i + bpp] + ((a + b) // 2).astype(np.uint8)
        elif f == 4:  # paeth
            o = out[y]
            o[:bpp] = cur[:bpp] + prev[:bpp]  # a=c=0 -> predictor is b
            for i in range(bpp, stride, bpp):
                a = o[i - bpp : i].astype(np.int16)
                b = prev[i : i + bpp].astype(np.int16)
                c = prev[i - bpp : i].astype(np.int16)
                p = a + b - c
                pa, pb, pc = np.abs(p - a), np.abs(p - b), np.abs(p - c)
                pred = np.where((pa <= pb) & (pa <= pc), a, np.where(pb <= pc, b, c))
                o[i : i + bpp] = cur[i : i + bpp] + pred.astype(np.uint8)
        else:
            raise ValueError(f"unknown PNG filter {f}")
    return out


def decode_png(payload: bytes):
    """PNG decode — stdlib zlib + NumPy unfiltering, no PIL.

    Supports 8- and 16-bit depth, color types 0 (gray), 2 (RGB),
    3 (palette, 8-bit only per spec), 4 (gray+alpha), 6 (RGBA), and
    both interlace methods (none / Adam7 — each of the 7 passes is an
    independently filtered sub-image scattered onto the x0+i*dx,
    y0+j*dy grid). Returns (h, w) for grayscale or (h, w, channels)
    otherwise; dtype uint8 at depth 8, uint16 (big-endian sample pairs
    reassembled) at depth 16. Sub-byte depths (1/2/4) raise
    NotImplementedError."""
    import zlib

    import numpy as np

    if payload[:8] != b"\x89PNG\r\n\x1a\n":
        raise ValueError("not a PNG payload")
    pos = 8
    ihdr = None
    idat = []
    plte = None
    while pos + 8 <= len(payload):
        ln = int.from_bytes(payload[pos : pos + 4], "big")
        typ = payload[pos + 4 : pos + 8]
        data = payload[pos + 8 : pos + 8 + ln]
        pos += 12 + ln  # len + type + data + crc
        if typ == b"IHDR":
            ihdr = data
        elif typ == b"IDAT":
            idat.append(data)
        elif typ == b"PLTE":
            plte = np.frombuffer(data, dtype=np.uint8).reshape(-1, 3)
        elif typ == b"IEND":
            break
    if ihdr is None or not idat:
        raise ValueError("PNG missing IHDR/IDAT")
    w = int.from_bytes(ihdr[0:4], "big")
    h = int.from_bytes(ihdr[4:8], "big")
    depth, ctype, _comp, _filt, interlace = ihdr[8], ihdr[9], ihdr[10], ihdr[11], ihdr[12]
    if interlace not in (0, 1):
        raise ValueError(f"unknown PNG interlace method {interlace}")
    if depth not in (8, 16):
        raise NotImplementedError(f"{depth}-bit PNG requires PIL (8/16-bit supported)")
    channels = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}.get(ctype)
    if channels is None:
        raise NotImplementedError(f"PNG color type {ctype} not supported")
    if ctype == 3 and depth == 16:
        raise ValueError("16-bit palette PNG is not valid per spec")
    bpp = channels * (depth // 8)

    raw = np.frombuffer(zlib.decompress(b"".join(idat)), dtype=np.uint8)
    if interlace == 0:
        out = _png_unfilter(raw, h, w * bpp, bpp).reshape(h, w, bpp)
    else:
        out = np.zeros((h, w, bpp), dtype=np.uint8)
        pos = 0
        for x0, y0, dx, dy in _ADAM7:
            pw = (w - x0 + dx - 1) // dx
            ph = (h - y0 + dy - 1) // dy
            if pw == 0 or ph == 0:
                continue  # empty pass on small images carries no bytes
            sz = ph * (pw * bpp + 1)
            sub = _png_unfilter(raw[pos : pos + sz], ph, pw * bpp, bpp)
            pos += sz
            out[y0::dy, x0::dx, :] = sub.reshape(ph, pw, bpp)
        if pos != raw.size:
            raise ValueError("PNG interlaced data size mismatch")
    if depth == 16:
        img = out.reshape(h, w, channels, 2).astype(np.uint16)
        img = (img[..., 0] << 8) | img[..., 1]  # big-endian sample pairs
    else:
        img = out
    if ctype == 3:
        if plte is None:
            raise ValueError("palette PNG missing PLTE")
        img = plte[img[:, :, 0]]
    return img[:, :, 0] if img.shape[2] == 1 else img


def decode_wav(payload: bytes):
    """RIFF/WAVE PCM (8- or 16-bit). Returns (float64 mono samples in
    [-1, 1], sample_rate). Multi-channel is averaged to mono."""
    import numpy as np

    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos, fmt, data = 12, None, None
    while pos + 8 <= len(payload):
        cid = payload[pos : pos + 4]
        size = int.from_bytes(payload[pos + 4 : pos + 8], "little")
        body = payload[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            fmt = body
        elif cid == b"data":
            data = body
        pos += 8 + size + (size & 1)  # chunks pad to even offsets
    if fmt is None or data is None:
        raise ValueError("WAV missing fmt/data chunk")
    audio_format = int.from_bytes(fmt[0:2], "little")
    n_channels = int.from_bytes(fmt[2:4], "little")
    sample_rate = int.from_bytes(fmt[4:8], "little")
    bits = int.from_bytes(fmt[14:16], "little")
    if audio_format != 1:
        raise NotImplementedError("compressed WAV requires ffmpeg (not in this container)")
    if bits == 16:
        samples = np.frombuffer(data, dtype="<i2").astype(np.float64) / 32768.0
    elif bits == 8:
        samples = (np.frombuffer(data, dtype=np.uint8).astype(np.float64) - 128.0) / 128.0
    else:
        raise NotImplementedError(f"{bits}-bit PCM not supported")
    if n_channels > 1:
        samples = samples[: len(samples) - len(samples) % n_channels]
        samples = samples.reshape(-1, n_channels).mean(axis=1)
    return samples, sample_rate


def _decode_payload(payload: bytes, width: int, height: int):
    """Decode an image payload to a 2-D grayscale float buffer.

    Real codecs for uncompressed formats (PPM/BMP, magic-sniffed);
    compressed mime types raise loudly (PIL not in this container);
    synthetic octet-stream payloads keep the deterministic fake so the
    batching/plumbing contract tests run without fixture files."""
    import numpy as np

    if payload is None:
        raise NotImplementedError("real media decoding requires PIL/ffmpeg (not in this container)")
    if payload[:2] == b"P6":
        return decode_ppm(payload).mean(axis=2)
    if payload[:2] == b"BM":
        return decode_bmp(payload).mean(axis=2)
    if payload[:4] == b"\x89PNG":
        img = decode_png(payload)
        if img.ndim == 2:
            return img
        if img.shape[2] == 2:  # gray+alpha: luminance only, never alpha
            return img[:, :, 0]
        return img[:, :, :3].mean(axis=2)  # RGB(A): average color channels
    if payload[:3] in (b"\xff\xd8\xff",):
        raise NotImplementedError("JPEG decoding requires PIL (not in this container)")
    # deterministic fake for synthetic octet-stream payloads (declared stub)
    raw = np.frombuffer(payload, dtype=np.uint8)
    if len(raw) == 0:
        # zero-length payload: no pixels (features become zeros; byte
        # stats report nan upstream), never a reshape error
        return np.zeros((0, 0), dtype=np.uint8)
    reps = int(np.ceil(width * height / len(raw)))
    return np.tile(raw, reps)[: width * height].reshape(height, width)


def _chunk_means(pix, sizes, k: int):
    """Per-item k-chunk means over a concatenated value buffer — one
    vectorized reduceat across the whole Arrow batch (no per-row loop).
    ``sizes``: per-item value counts; returns (n, k) float32."""
    import numpy as np

    n = len(sizes)
    if len(pix) == 0:
        # reduceat raises on an empty operand; an all-empty batch is
        # all-zero features by the flat_len>0 masking below anyway
        return np.zeros((n, k), dtype=np.float32)
    div, mod = np.divmod(sizes, k)
    chunk_len = div[:, None] + (np.arange(k)[None, :] < mod[:, None])
    flat_len = chunk_len.ravel()
    ends = np.cumsum(flat_len)
    cstarts = np.concatenate(([0], ends[:-1]))
    sums = np.add.reduceat(pix, np.minimum(cstarts, max(len(pix) - 1, 0)))
    # duplicate reduceat indices (zero-length chunks) yield the NEXT
    # element's value, not 0 — flat_len>0 masks those slots
    feat = np.where(flat_len > 0, sums / np.maximum(flat_len, 1), 0.0)
    return feat.reshape(n, k).astype(np.float32)


def decode_images(media: DataFrame, batch_features: int = 8) -> DataFrame:
    """mapInPandas decode + feature extraction over image rows.

    Output: FEATURE_SCHEMA — byte stats + a fixed-size feature vector
    (k-chunk mean downsample of the decoded grayscale buffer; chunking
    follows the DECODED size, so real codecs with their own dimensions
    and the metadata-sized fake both work)."""
    import numpy as np
    import pandas as pd

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        k = batch_features
        for pdf in batches:
            if len(pdf) == 0:
                continue
            n = len(pdf)
            payloads = pdf["payload"].tolist()
            # --- byte stats: one reduceat over the whole Arrow batch ---
            n_bytes = np.fromiter((len(p) for p in payloads), dtype=np.int64, count=n)
            flat = np.frombuffer(b"".join(payloads), dtype=np.uint8).astype(np.float64)
            starts = np.concatenate(([0], np.cumsum(n_bytes)[:-1]))
            if flat.size:
                sums = np.add.reduceat(flat, np.minimum(starts, flat.size - 1))
                # zero-length payloads make reduceat see duplicate start
                # indices and pick up the NEXT payload's first byte —
                # mask them; empty payloads report nan (matches the old
                # per-row np.mean degradation), never inf
                mean_byte = np.where(n_bytes > 0, sums / np.maximum(n_bytes, 1), np.nan)
            else:
                mean_byte = np.full(n, np.nan)
            # --- decode (per item: the codec bound — codecs are
            # inherently per-object) then a single vectorized feature
            # pass over all decoded pixels in the batch ---
            widths = pdf["width"].to_numpy(np.int64)
            heights = pdf["height"].to_numpy(np.int64)
            decoded = [
                _decode_payload(p, int(w), int(h)).ravel()
                for p, w, h in zip(payloads, widths, heights)
            ]
            pix = np.concatenate(decoded).astype(np.float64)
            sizes = np.fromiter((d.size for d in decoded), dtype=np.int64, count=n)
            feat = _chunk_means(pix, sizes, k)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"].to_numpy(np.int64),
                    "kind": pdf["kind"].to_numpy(),
                    "n_bytes": n_bytes,
                    "mean_byte": mean_byte,
                    "feature": list(feat),
                }
            )

    return media.filter(F.col("kind") == "image").mapInPandas(run, schema=FEATURE_SCHEMA)


def decode_audio(media: DataFrame, batch_features: int = 8) -> DataFrame:
    """mapInPandas WAV-PCM decode + audio features over audio rows.

    Output: AUDIO_SCHEMA — sample count/rate, RMS amplitude, and a
    k-chunk mean-amplitude envelope (the audio analogue of the image
    downsample feature)."""
    import numpy as np
    import pandas as pd

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        k = batch_features
        for pdf in batches:
            if len(pdf) == 0:
                continue
            n = len(pdf)
            decoded = [decode_wav(p) for p in pdf["payload"].tolist()]
            rates = np.fromiter((r for _, r in decoded), dtype=np.int32, count=n)
            sizes = np.fromiter((s.size for s, _ in decoded), dtype=np.int64, count=n)
            samples = np.concatenate([s for s, _ in decoded])
            starts = np.concatenate(([0], np.cumsum(sizes)[:-1]))
            if samples.size:
                sq = np.add.reduceat(samples**2, np.minimum(starts, samples.size - 1))
                rms = np.sqrt(np.where(sizes > 0, sq / np.maximum(sizes, 1), 0.0))
            else:
                rms = np.zeros(n)
            feat = _chunk_means(np.abs(samples), sizes, k)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"].to_numpy(np.int64),
                    "n_samples": sizes,
                    "sample_rate": rates,
                    "rms": rms,
                    "feature": list(feat),
                }
            )

    return media.filter(F.col("kind") == "audio").mapInPandas(run, schema=AUDIO_SCHEMA)


def extract_image_features(media: DataFrame, dim: int = 8) -> DataFrame:
    """Alias shape for decode_images with a chosen feature dim."""
    return decode_images(media, batch_features=dim)


def sample_video_frames(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Frame-sampling plumbing: one output row per sampled timestamp.

    The frame decode itself is the stub; the explode/batching shape is
    the real 100 TB-scale pattern (rows fan out before decode so frame
    work distributes)."""
    stamps = F.sequence(F.lit(0), F.greatest(F.col("duration_ms") - 1, F.lit(0)), F.lit(every_ms))
    return (
        media.filter(F.col("kind") == "video")
        .select("media_id", "payload", "width", "height", F.explode(stamps).alias("ts_ms"))
    )
