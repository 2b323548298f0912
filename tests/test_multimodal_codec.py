"""Real-codec multimodal tests — skip unless PIL is installed (it is not in
this image). Each test builds genuine image bytes with PIL on the driver,
pushes them through the Spark mapInPandas kernels with ``decode_stub=False``,
and asserts parity against a driver-local PIL reference computation — so the
first environment with pillow exercises the real decode/resize/frame-seek
paths end-to-end with value checks, not just smoke."""

import numpy as np
import pytest

PIL = pytest.importorskip("PIL", reason="pillow not installed in this image")

from PIL import Image  # noqa: E402

from dask_lightgbm_spark.operators import multimodal  # noqa: E402


def _png_bytes(seed: int, w: int = 12, h: int = 9) -> bytes:
    import io

    rng = np.random.default_rng(seed)
    img = Image.fromarray(rng.integers(0, 256, size=(h, w), dtype=np.uint8), mode="L")
    buf = io.BytesIO()
    img.save(buf, format="PNG")
    return buf.getvalue()


def _gif_bytes(seed: int, n_frames: int, w: int = 6, h: int = 4) -> bytes:
    import io

    rng = np.random.default_rng(seed)
    frames = [
        Image.fromarray(rng.integers(0, 256, size=(h, w), dtype=np.uint8), mode="L")
        for _ in range(n_frames)
    ]
    buf = io.BytesIO()
    frames[0].save(buf, format="GIF", save_all=True, append_images=frames[1:])
    return buf.getvalue()


def _payload_df(spark, payloads):
    return spark.createDataFrame(
        [(i, bytearray(p)) for i, p in enumerate(payloads)], "doc_id long, payload binary"
    )


def test_extract_features_real_decode(spark):
    payloads = [_png_bytes(s) for s in range(4)]
    out = (
        multimodal.extract_features(_payload_df(spark, payloads), dim=8, decode_stub=False)
        .orderBy("doc_id")
        .collect()
    )
    assert len(out) == 4
    import io

    for row, payload in zip(out, payloads):
        px = np.asarray(Image.open(io.BytesIO(payload)).convert("L"), dtype=np.int64).ravel()
        expect = np.bincount(px * 8 // 256, minlength=8).astype(np.float32) / px.size
        assert row.n_bytes == len(payload)
        assert np.allclose(np.array(row.feature, dtype=np.float32), expect)


def test_resize_images_real_decode(spark):
    payloads = [_png_bytes(100 + s, w=16, h=10) for s in range(3)]
    out = (
        multimodal.resize_images(_payload_df(spark, payloads), 5, 7, decode_stub=False)
        .orderBy("doc_id")
        .collect()
    )
    import io

    for row, payload in zip(out, payloads):
        ref = Image.open(io.BytesIO(payload)).convert("L").resize((5, 7), Image.NEAREST)
        assert (row.width, row.height) == (5, 7)
        assert bytes(row.payload) == ref.tobytes()
        assert len(bytes(row.payload)) == 5 * 7


def test_sample_frames_real_gif(spark):
    # 10-frame GIF, sample 4 evenly-spaced frames -> seeks 0, 2, 4, 6
    payloads = [_gif_bytes(7, n_frames=10)]
    out = (
        multimodal.sample_frames(
            _payload_df(spark, payloads), n_frames=4, frame_bytes=24, decode_stub=False
        )
        .orderBy("doc_id", "frame_idx")
        .collect()
    )
    assert [r.frame_idx for r in out] == [0, 1, 2, 3]
    import io

    img = Image.open(io.BytesIO(payloads[0]))
    for r in out:
        img.seek(r.frame_idx * (10 // 4))
        expect = img.convert("L").tobytes()[:24].ljust(24, b"\0")
        assert bytes(r.frame) == expect
