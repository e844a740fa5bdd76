"""Multimodal column operators (training-data pipeline ops).

Images / audio / video are opaque `binary` columns with typed metadata
structs. The Spark-side plumbing (schemas, Arrow batch shapes, UDF
signatures, partitioning) is real and tested; the actual codec work is
stubbed because no image/audio libraries exist in this container:

 - `decode="fake"` (default): deterministic decode — byte histograms /
   strided byte samples stand in for pixels & PCM so downstream feature
   code is exercised end-to-end with stable values.
 - `decode="real"`: raises NotImplementedError with the intended
   implementation notes (PIL/libvips, soundfile/ffmpeg) — swap-in point
   for production.

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
    """binary blobs → feature vectors via mapInPandas (Arrow batches)."""
    if decode == "real":
        raise NotImplementedError(
            "real image decode needs PIL/libvips (absent in this "
            "container); plug it into _fake_image_features' slot")

    import pandas as pd

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
                        lambda b: _fake_image_features(b or b"")).values,
                })

    return (df.select(url_col, blob_col)
              .mapInPandas(gen, schema=IMAGE_FEATURES_SCHEMA))


def audio_frame_sample(df, blob_col: str = "html", url_col: str = "url",
                       frame_bytes: int = 256, max_frames: int = 4,
                       decode: str = "fake"):
    """binary blobs → sampled frames with RMS, one output row per frame
    (UDTF-shaped: mapInPandas row expansion)."""
    if decode == "real":
        raise NotImplementedError(
            "real audio decode needs soundfile/ffmpeg (absent); replace "
            "the byte-stride sampler below")

    import math
    import pandas as pd

    def gen(batches: Iterator) -> Iterator:
        for pdf in batches:
            urls, idxs, sizes, rmss = [], [], [], []
            for url, blob in zip(pdf[url_col], pdf[blob_col]):
                blob = blob or b""
                n = max(1, min(max_frames, len(blob) // frame_bytes or 1))
                for fi in range(n):
                    frame = blob[fi * frame_bytes:(fi + 1) * frame_bytes]
                    rms = (math.sqrt(sum(b * b for b in frame)
                                     / max(len(frame), 1))
                           if frame else 0.0)
                    urls.append(url)
                    idxs.append(fi)
                    sizes.append(len(frame))
                    rmss.append(round(rms, 6))
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
            "real video decode needs pyav/ffmpeg (absent in this "
            "container); replace the block sampler below")

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
