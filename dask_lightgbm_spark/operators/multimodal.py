"""Multimodal (image/audio/video) column support.

Design: media rides in opaque ``binary`` columns with a typed metadata
struct alongside; decode / feature-extract / resize / frame-sample are
Arrow-batched ``mapInPandas`` stages. With ``decode_stub=True`` (the
default here — codec libraries are NOT in this image) the decoder is a
deterministic byte-level fake so the plumbing is value-testable; with
``decode_stub=False`` the kernels use the REAL codec (PIL: image decode,
nearest-neighbor resize, animated-GIF frame seek) when importable and raise
``NotImplementedError`` naming the missing library otherwise. The real
paths are covered by ``tests/test_multimodal_codec.py``, which skips unless
PIL is installed — the first richer image runs them untouched.

At 100 TB: binary payloads dominate partition size → ``maxPartitionBytes``
governs scan parallelism; decode is CPU-bound per-row and embarrassingly
parallel, so the plan is scan → mapInPandas with no shuffle at all.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def binary_metadata(df: DataFrame, id_col: str, payload_col: str) -> DataFrame:
    """Byte-level metadata of a (text-or-binary) payload column — the
    cheap, codec-free plumbing check: byte length, char length, digest."""
    c = F.col(payload_col)
    return df.select(
        F.col(id_col),
        F.octet_length(c).cast("long").alias("byte_len"),
        F.length(c).cast("long").alias("char_len"),
        F.md5(c).alias("content_hash"),
    )


def attach_binary_payload(df: DataFrame, text_col: str) -> DataFrame:
    """Turn a text column into the canonical multimodal layout:
    (payload binary, meta struct<mime,byte_len>)."""
    payload = F.encode(F.col(text_col), "UTF-8")
    return df.withColumn("payload", payload).withColumn(
        "meta",
        F.struct(
            F.lit("application/octet-stream").alias("mime"),
            F.octet_length(payload).cast("long").alias("byte_len"),
        ),
    )


_FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("feature", T.ArrayType(T.FloatType())),
    ]
)


def extract_features(
    df: DataFrame, id_col: str = "doc_id", payload_col: str = "payload",
    dim: int = 8, decode_stub: bool = True,
) -> DataFrame:
    """Decode + feature-extract over Arrow batches (``mapInPandas``).

    With ``decode_stub`` the "decoder" is a deterministic byte-histogram
    projection (so tests can assert values); without it, the payload is
    decoded as a real image (PIL, grayscale) and the feature is a
    ``dim``-bucket luminance histogram normalized by pixel count. Raises
    NotImplementedError only when PIL is genuinely absent.
    """

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        if not decode_stub:
            try:
                import io

                from PIL import Image
            except ImportError as exc:  # pragma: no cover - env-dependent
                raise NotImplementedError(
                    "real image decode requires PIL, not installed in this "
                    "environment (pip install pillow)"
                ) from exc
        for pdf in batches:
            if len(pdf) == 0:
                continue
            if decode_stub:
                # vectorized across the whole Arrow batch (guide §4.2): one
                # contiguous byte buffer + a single segmented bincount on
                # (row_idx·dim + byte%dim) replaces a per-row Python loop of
                # small bincounts. float32 hist / float32 len reproduces the
                # per-row `hist / max(len, 1)` IEEE ops exactly (lengths are
                # int-exact in float32 at document sizes).
                payloads = [bytes(p) for p in pdf[payload_col]]
                n = len(payloads)
                lens = np.fromiter(map(len, payloads), dtype=np.int64, count=n)
                buf = np.frombuffer(b"".join(payloads), dtype=np.uint8)
                keys = np.repeat(np.arange(n, dtype=np.int64), lens) * dim + (
                    buf % dim
                )
                hists = (
                    np.bincount(keys, minlength=n * dim)
                    .reshape(n, dim)
                    .astype(np.float32)
                )
                feats_mat = hists / np.maximum(lens, 1).astype(np.float32)[:, None]
                feats = list(feats_mat)
                n_bytes = lens
            else:
                feats, sizes = [], []
                for payload in pdf[payload_col]:
                    raw = bytes(payload)
                    img = Image.open(io.BytesIO(raw)).convert("L")
                    px = np.asarray(img, dtype=np.int64).ravel()
                    hist = np.bincount(px * dim // 256, minlength=dim).astype(np.float32)
                    feats.append(hist / max(px.size, 1))
                    sizes.append(len(raw))
                n_bytes = sizes
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col].values,
                    "n_bytes": n_bytes,
                    "feature": feats,
                }
            )

    return df.mapInPandas(kernel, schema=_FEATURE_SCHEMA)


_RESIZE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("payload", T.BinaryType()),
    ]
)


def resize_images(
    df: DataFrame, width: int, height: int,
    id_col: str = "doc_id", payload_col: str = "payload",
    decode_stub: bool = True,
) -> DataFrame:
    """Image resize over Arrow batches. Stub 'resize' truncates/pads the
    byte payload to width·height (deterministic, testable); the real kernel
    (``decode_stub=False``, requires PIL) decodes, converts to grayscale and
    resizes with NEAREST (chosen over BILINEAR for cross-PIL-version
    determinism), emitting the raw width·height pixel bytes."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        target = width * height
        if not decode_stub:
            try:
                import io

                from PIL import Image
            except ImportError as exc:  # pragma: no cover - env-dependent
                raise NotImplementedError(
                    "real image resize requires PIL, not installed in this "
                    "environment (pip install pillow)"
                ) from exc
        for pdf in batches:
            if len(pdf) == 0:
                continue
            out = []
            for payload in pdf[payload_col]:
                raw = bytes(payload)
                if decode_stub:
                    out.append(raw[:target].ljust(target, b"\0"))
                else:
                    img = Image.open(io.BytesIO(raw)).convert("L")
                    out.append(img.resize((width, height), Image.NEAREST).tobytes())
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col].values,
                    "width": width,
                    "height": height,
                    "payload": out,
                }
            )

    return df.mapInPandas(kernel, schema=_RESIZE_SCHEMA)


_FRAME_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("frame", T.BinaryType()),
    ]
)


def sample_frames(
    df: DataFrame, n_frames: int, frame_bytes: int = 16,
    id_col: str = "doc_id", payload_col: str = "payload",
    decode_stub: bool = True,
) -> DataFrame:
    """Video frame sampling (1 row in → n_frames rows out) over Arrow
    batches. Stub samples evenly-spaced byte windows; the real kernel
    (``decode_stub=False``, requires PIL) seeks n_frames evenly-spaced
    frames of an animated image (GIF/APNG/WebP — the containers PIL can
    walk; an mp4 path would swap in pyav here) and emits each frame's
    grayscale bytes truncated/padded to ``frame_bytes``. Row-expanding
    mapInPandas — the same shape any real decoder needs."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        if not decode_stub:
            try:
                import io

                from PIL import Image
            except ImportError as exc:  # pragma: no cover - env-dependent
                raise NotImplementedError(
                    "real frame extraction requires PIL (animated containers)"
                    " or pyav (mp4), neither installed in this environment"
                ) from exc
        for pdf in batches:
            if len(pdf) == 0:
                continue
            ids, idxs, frames = [], [], []
            for doc_id, payload in zip(pdf[id_col], pdf[payload_col]):
                raw = bytes(payload)
                if decode_stub:
                    step = max(len(raw) // max(n_frames, 1), 1)
                    for i in range(n_frames):
                        start = min(i * step, max(len(raw) - frame_bytes, 0))
                        ids.append(doc_id)
                        idxs.append(i)
                        frames.append(
                            raw[start : start + frame_bytes].ljust(frame_bytes, b"\0")
                        )
                else:
                    img = Image.open(io.BytesIO(raw))
                    n_total = int(getattr(img, "n_frames", 1))
                    step = max(n_total // max(n_frames, 1), 1)
                    for i in range(n_frames):
                        img.seek(min(i * step, n_total - 1))
                        fb = img.convert("L").tobytes()
                        ids.append(doc_id)
                        idxs.append(i)
                        frames.append(fb[:frame_bytes].ljust(frame_bytes, b"\0"))
            yield pd.DataFrame({"doc_id": ids, "frame_idx": idxs, "frame": frames})

    return df.mapInPandas(kernel, schema=_FRAME_SCHEMA)
