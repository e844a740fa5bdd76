"""Multimodal column operators (training-data pipeline ops).

Images / audio / video are opaque `binary` columns with typed metadata
structs. The Spark-side plumbing (schemas, Arrow batch shapes, UDF
signatures, partitioning) is real and tested. Decode modes:

 - `decode="fake"` (default): deterministic decode — byte histograms /
   strided byte samples stand in for pixels & PCM so downstream feature
   code is exercised end-to-end with stable values.
 - `decode="real"`: REAL decoding for the formats the sandbox can
   parse without external libraries — PPM/PGM (P6/P5) and uncompressed
   24-bit BMP images (pure numpy), PCM WAV audio (stdlib `wave` +
   `audioop`). Compressed formats (JPEG/PNG, MP3/OGG, any video
   container) raise ValueError: no codec libraries exist in this
   container (PIL/libvips, soundfile/ffmpeg are the production
   swap-ins; the UDF signature and batch shape are identical).

Batches are bytes-capped: a media batch is re-chunked so that no Arrow
batch exceeds `max_batch_bytes`, which is the long-blob analogue of the
row cap in config.py (skew discipline for 100 MB videos in a batch of
10 KB thumbnails).
"""

from typing import Iterator

IMAGE_META_SCHEMA = ("struct<width:int,height:int,format:string,"
                     "n_bytes:long>")
IMAGE_FEATURES_SCHEMA = (
    "url string, n_bytes long, byte_entropy double, features array<float>")

AUDIO_FRAMES_SCHEMA = (
    "url string, frame_idx int, n_bytes long, rms double")

VIDEO_FRAMES_SCHEMA = (
    "url string, frame_idx int, ts_ms long, n_bytes long, "
    "mean_intensity double, features array<float>")

MAX_BATCH_BYTES = 64 << 20


def _entropy(data: bytes) -> float:
    import math
    if not data:
        return 0.0
    counts = [0] * 256
    for b in data:
        counts[b] += 1
    n = len(data)
    return -sum((c / n) * math.log2(c / n) for c in counts if c)


def _fake_image_features(data: bytes, dim: int = 16):
    """Deterministic stand-in for a CNN embedding: normalized 16-bucket
    byte histogram."""
    counts = [0] * dim
    for b in data:
        counts[b % dim] += 1
    n = max(len(data), 1)
    return [c / n for c in counts]


def decode_image(data: bytes):
    """Real image decode for library-free formats → (H, W[, C]) uint8
    numpy array. Supports binary PPM (P6), PGM (P5), and uncompressed
    24-bit BMP (BITMAPINFOHEADER). Raises ValueError for anything else
    (JPEG/PNG need a codec library)."""
    import numpy as np

    if data[:2] in (b"P6", b"P5"):
        # netpbm: magic, whitespace/comments, width height maxval, raster
        pos, fields = 2, []
        while len(fields) < 3:
            while pos < len(data) and data[pos:pos + 1].isspace():
                pos += 1
            if data[pos:pos + 1] == b"#":
                while pos < len(data) and data[pos:pos + 1] != b"\n":
                    pos += 1
                continue
            start = pos
            while pos < len(data) and not data[pos:pos + 1].isspace():
                pos += 1
            fields.append(int(data[start:pos]))
        pos += 1   # single whitespace after maxval
        w, h, maxval = fields
        if maxval > 255:
            raise ValueError("16-bit netpbm not supported")
        ch = 3 if data[:2] == b"P6" else 1
        raster = np.frombuffer(data, dtype=np.uint8, count=w * h * ch,
                               offset=pos)
        img = raster.reshape((h, w, ch))
        return img[:, :, 0] if ch == 1 else img
    if data[:2] == b"BM":
        import struct
        off = struct.unpack_from("<I", data, 10)[0]
        hdr_sz, w, h = struct.unpack_from("<Iii", data, 14)
        planes, bpp = struct.unpack_from("<HH", data, 26)
        compression = struct.unpack_from("<I", data, 30)[0]
        if bpp != 24 or compression != 0:
            raise ValueError(f"unsupported BMP (bpp={bpp}, "
                             f"compression={compression})")
        import numpy as np
        row_sz = (w * 3 + 3) & ~3          # rows padded to 4 bytes
        flip = h > 0                       # positive height = bottom-up
        h = abs(h)
        rows = np.frombuffer(data, dtype=np.uint8, count=row_sz * h,
                             offset=off).reshape((h, row_sz))
        img = rows[:, :w * 3].reshape((h, w, 3))[:, :, ::-1]  # BGR→RGB
        return img[::-1] if flip else img
    raise ValueError(
        "no codec for this image format in the sandbox (PIL/libvips "
        "are the production swap-in); supported here: PPM/PGM, 24-bit "
        "uncompressed BMP")


def _real_image_features(data: bytes, dim: int = 16):
    """Real features from decoded pixels: normalized `dim`-bucket
    GRAYSCALE histogram (same output contract as the fake path)."""
    import numpy as np
    img = decode_image(data)
    gray = (img.mean(axis=2) if img.ndim == 3 else img).astype(np.float64)
    hist, _ = np.histogram(gray, bins=dim, range=(0, 256))
    n = max(int(hist.sum()), 1)
    return (hist / n).tolist()


def decode_wav(data: bytes):
    """Real PCM WAV decode via stdlib `wave`: returns (params, frames
    bytes). Raises for non-WAV / compressed audio."""
    import io
    import wave
    try:
        with wave.open(io.BytesIO(data)) as wf:
            params = wf.getparams()
            frames = wf.readframes(wf.getnframes())
        return params, frames
    except (wave.Error, EOFError) as e:
        raise ValueError(
            f"no codec for this audio format in the sandbox ({e}); "
            "supported here: PCM WAV (soundfile/ffmpeg are the "
            "production swap-in)") from e


def _rechunk_by_bytes(pdf, blob_col: str, max_bytes: int):
    """Split a pandas batch so no sub-batch exceeds max_bytes of blobs."""
    sizes = pdf[blob_col].map(lambda b: len(b) if b is not None else 0)
    start, acc = 0, 0
    for i, s in enumerate(sizes):
        if acc + s > max_bytes and i > start:
            yield pdf.iloc[start:i]
            start, acc = i, 0
        acc += int(s)
    if start < len(pdf):
        yield pdf.iloc[start:]


def image_features(df, blob_col: str = "html", url_col: str = "url",
                   decode: str = "fake",
                   max_batch_bytes: int = MAX_BATCH_BYTES):
    """binary blobs → feature vectors via mapInPandas (Arrow batches).

    decode="real" decodes PPM/PGM/BMP pixels (decode_image) and emits a
    grayscale-histogram feature; other formats raise per-row ValueError
    — the job fails fast rather than silently emitting garbage."""
    import pandas as pd

    featurize = (_real_image_features if decode == "real"
                 else _fake_image_features)

    def gen(batches: Iterator) -> Iterator:
        for pdf in batches:
            for chunk in _rechunk_by_bytes(pdf, blob_col, max_batch_bytes):
                blobs = chunk[blob_col]
                yield pd.DataFrame({
                    "url": chunk[url_col].values,
                    "n_bytes": blobs.map(
                        lambda b: len(b) if b is not None else 0).values,
                    "byte_entropy": blobs.map(
                        lambda b: round(_entropy(b or b""), 6)).values,
                    "features": blobs.map(
                        lambda b: featurize(b or b"")).values,
                })

    return (df.select(url_col, blob_col)
              .mapInPandas(gen, schema=IMAGE_FEATURES_SCHEMA))


def audio_frame_sample(df, blob_col: str = "html", url_col: str = "url",
                       frame_bytes: int = 256, max_frames: int = 4,
                       decode: str = "fake"):
    """binary blobs → sampled frames with RMS, one output row per frame
    (UDTF-shaped: mapInPandas row expansion).

    decode="real" parses PCM WAV via stdlib wave/audioop: frames are
    `frame_bytes`-sized windows of the DECODED sample stream and RMS is
    computed on samples at the true width; non-WAV blobs raise."""
    import math
    import pandas as pd

    def frames_of(blob: bytes):
        if decode == "real":
            params, pcm = decode_wav(blob)
            import audioop
            n = max(1, min(max_frames, len(pcm) // frame_bytes or 1))
            for fi in range(n):
                window = pcm[fi * frame_bytes:(fi + 1) * frame_bytes]
                rms = (audioop.rms(window, params.sampwidth)
                       if window else 0)
                yield fi, len(window), float(rms)
            return
        n = max(1, min(max_frames, len(blob) // frame_bytes or 1))
        for fi in range(n):
            frame = blob[fi * frame_bytes:(fi + 1) * frame_bytes]
            rms = (math.sqrt(sum(b * b for b in frame)
                             / max(len(frame), 1)) if frame else 0.0)
            yield fi, len(frame), round(rms, 6)

    def gen(batches: Iterator) -> Iterator:
        for pdf in batches:
            urls, idxs, sizes, rmss = [], [], [], []
            for url, blob in zip(pdf[url_col], pdf[blob_col]):
                for fi, size, rms in frames_of(blob or b""):
                    urls.append(url)
                    idxs.append(fi)
                    sizes.append(size)
                    rmss.append(rms)
            yield pd.DataFrame({"url": urls, "frame_idx": idxs,
                                "n_bytes": sizes, "rms": rmss})

    return (df.select(url_col, blob_col)
              .mapInPandas(gen, schema=AUDIO_FRAMES_SCHEMA))


def video_frame_sample(df, blob_col: str = "html", url_col: str = "url",
                       frame_bytes: int = 1024, fps_ms: int = 40,
                       max_frames: int = 3, feature_dim: int = 8,
                       decode: str = "fake",
                       max_batch_bytes: int = MAX_BATCH_BYTES):
    """binary blobs → sampled "video frames" with a timestamp, mean
    intensity and a per-frame feature vector (UDTF-shaped mapInPandas
    row expansion; bytes-capped batches like image_features).

    decode="fake" treats each `frame_bytes` block as one decoded frame
    at a synthetic `fps_ms` cadence — the Spark-side contract (schema,
    batch shape, per-frame fan-out ratio) is exactly what a real
    ffmpeg/pyav frame sampler would produce."""
    if decode == "real":
        raise NotImplementedError(
            "real video decode needs a container demuxer + codec "
            "(pyav/ffmpeg, absent in this container — no stdlib "
            "equivalent exists); replace the block sampler below")

    import pandas as pd

    def gen(batches: Iterator) -> Iterator:
        for pdf in batches:
            for chunk in _rechunk_by_bytes(pdf, blob_col, max_batch_bytes):
                urls, idxs, tss, sizes, means, feats = ([], [], [], [], [],
                                                        [])
                for url, blob in zip(chunk[url_col], chunk[blob_col]):
                    blob = blob or b""
                    n = max(1, min(max_frames,
                                   len(blob) // frame_bytes or 1))
                    for fi in range(n):
                        frame = blob[fi * frame_bytes:(fi + 1) * frame_bytes]
                        urls.append(url)
                        idxs.append(fi)
                        tss.append(fi * fps_ms)
                        sizes.append(len(frame))
                        means.append(round(sum(frame)
                                           / max(len(frame), 1), 6))
                        feats.append(_fake_image_features(frame,
                                                          feature_dim))
                yield pd.DataFrame({"url": urls, "frame_idx": idxs,
                                    "ts_ms": tss, "n_bytes": sizes,
                                    "mean_intensity": means,
                                    "features": feats})

    return (df.select(url_col, blob_col)
              .mapInPandas(gen, schema=VIDEO_FRAMES_SCHEMA))
