"""Multimodal plumbing tests: metadata, fake decode, feature extraction.

The decode/feature kernels are environment-stubbed (no media libs in
this container); ``fake=True`` exercises the real mapInPandas contract
(schema, Arrow batch shape, null handling) with a deterministic stand-in.
"""

from __future__ import annotations

import pytest

from world_vaccination_coverage_etl_spark.operators.multimodal import (
    attach_binary_metadata,
    decode_image_batch,
    extract_features,
)


def _assets(spark):
    rows = [
        (0, "image/png", bytes(range(200))),
        (1, "image/jpeg", b"\xff\xd8" + b"x" * 1000),
        (2, "image/png", None),
    ]
    return spark.createDataFrame(rows, "asset_id long, mime string, payload binary")


def test_metadata_jvm_expressions(spark):
    out = {r.asset_id: r for r in attach_binary_metadata(_assets(spark)).collect()}
    assert out[0].n_bytes == 200
    assert out[1].n_bytes == 1002
    assert out[2].n_bytes is None
    assert len(out[0].sha) == 64          # sha2-256 hex
    assert out[0].head_hex.startswith("00010203")


def test_fake_decode_contract(spark):
    out = decode_image_batch(_assets(spark), fake=True)
    assert [f.name for f in out.schema.fields] == [
        "asset_id", "mime", "n_bytes", "width", "height", "mean_intensity",
    ]
    rows = {r.asset_id: r for r in out.collect()}
    assert rows[0].n_bytes == 200 and rows[0].width >= 1
    assert rows[2].width == 0             # null payload -> zeros
    # determinism
    again = {r.asset_id: r for r in decode_image_batch(_assets(spark), fake=True).collect()}
    assert rows[0] == again[0]


def test_decode_without_fake_raises_only_without_pil(spark):
    """fake=False must raise exactly when PIL is absent; where PIL
    exists the NotImplementedError path is unreachable (r5 verdict
    item 5)."""
    try:
        import PIL  # noqa: F401

        pytest.skip("PIL present: real-decode path covered below")
    except ImportError:
        pass
    with pytest.raises(Exception, match="NotImplementedError|requires PIL"):
        decode_image_batch(_assets(spark), fake=False).collect()


def test_decode_real_png_with_pil(spark):
    """Real decode through the same mapInPandas kernel, auto-skipped
    where PIL is unavailable: a generated 2x2 grayscale PNG must come
    back with exact dimensions and mean intensity, and a corrupt
    payload must degrade to the (0, 0, 0.0) sentinel, not fail the
    batch."""
    Image = pytest.importorskip("PIL.Image")
    import io

    buf = io.BytesIO()
    im = Image.new("L", (2, 2))
    im.putdata([0, 100, 200, 100])  # mean 100.0
    im.save(buf, format="PNG")
    png = buf.getvalue()

    df = spark.createDataFrame(
        [(0, bytearray(png), "image/png"), (1, bytearray(b"not a png"), "image/png")],
        "asset_id long, payload binary, mime string",
    )
    rows = {r.asset_id: r for r in decode_image_batch(df, fake=False).collect()}
    assert (rows[0].width, rows[0].height) == (2, 2)
    assert abs(rows[0].mean_intensity - 100.0) < 1e-9
    assert (rows[1].width, rows[1].height, rows[1].mean_intensity) == (0, 0, 0.0)


def test_fake_features_normalized(spark):
    import math

    out = {r.asset_id: r.feature for r in extract_features(_assets(spark), dim=8, fake=True).collect()}
    assert len(out[0]) == 8
    norm = math.sqrt(sum(x * x for x in out[0]))
    assert abs(norm - 1.0) < 1e-9
    assert out[2] == [0.0] * 8            # null payload -> zero vector


def test_binaryfile_source_ingest_path(spark, tmp_path):
    """The at-scale media ingest path: raw asset files on storage read
    via Spark's built-in `binaryFile` source (path/length/content per
    file, distributed, no Python), then straight into the engine's
    metadata/decode plumbing."""
    import pyspark.sql.functions as F

    blobs = {"a.png": bytes(range(64)), "b.jpg": b"\xff\xd8" + b"j" * 300}
    for name, payload in blobs.items():
        (tmp_path / name).write_bytes(payload)

    raw = spark.read.format("binaryFile").load(str(tmp_path))
    assert raw.count() == 2
    got = {r.path.rsplit("/", 1)[-1]: r for r in raw.collect()}
    for name, payload in blobs.items():
        assert got[name].length == len(payload)
        assert bytes(got[name].content) == payload

    # plumb into the engine's asset contract
    assets = raw.select(
        F.monotonically_increasing_id().alias("asset_id"),
        F.when(F.col("path").endswith(".png"), "image/png")
        .otherwise("image/jpeg")
        .alias("mime"),
        F.col("content").alias("payload"),
    )
    meta = attach_binary_metadata(assets)
    assert {r.n_bytes for r in meta.collect()} == {64, 302}

    # pushdown: binaryFile supports file-metadata filters (length) —
    # a small-file-only scan never materializes the big payloads
    small = spark.read.format("binaryFile").load(str(tmp_path)).filter(
        F.col("length") < 100
    )
    assert small.count() == 1


# ------------------------------------------------------------- resize (r9)

def test_resize_nearest_floor_mapping_all_formats(spark):
    import numpy as np

    from world_vaccination_coverage_etl_spark.operators.gif_codec import (
        gif_encode,
    )
    from world_vaccination_coverage_etl_spark.operators.jpeg_codec import (
        jpeg_encode,
    )
    from world_vaccination_coverage_etl_spark.operators.multimodal import (
        resize_image_batch,
    )
    from world_vaccination_coverage_etl_spark.operators.png_codec import (
        png_encode,
    )

    # one source per format, all decoding to a KNOWN luma plane:
    # gray PNG (exact), gray palette GIF (palette i -> (i,i,i), luma
    # == index), block-constant JPEG (exact DC path)
    w, h = 6, 5
    plane = (np.arange(w * h, dtype=np.int64).reshape(h, w) * 7 % 256).astype(
        np.uint8
    )
    png = png_encode(w, h, plane.tobytes(), color_type=0)
    pal = bytes(v for i in range(256) for v in (i, i, i))
    gif = gif_encode(w, h, plane.tobytes(), pal)
    jblk = np.full((8, 8), 99, dtype=np.uint8)
    jpg = jpeg_encode(8, 8, jblk.tobytes(), channels=1)

    df = spark.createDataFrame(
        [
            (1, "image/png", bytearray(png)),
            (2, "image/gif", bytearray(gif)),
            (3, "image/jpeg", bytearray(jpg)),
            (4, "image/png", bytearray(b"\x89PNG\r\n\x1a\nbroken")),
            (5, "image/png", None),
        ],
        "asset_id long, mime string, payload binary",
    )
    out_w, out_h = 4, 3
    rows = {
        r["asset_id"]: r
        for r in resize_image_batch(df, out_w=out_w, out_h=out_h).collect()
    }
    yi = (np.arange(out_h, dtype=np.int64) * h) // out_h
    xi = (np.arange(out_w, dtype=np.int64) * w) // out_w
    want = plane[yi][:, xi]
    for aid in (1, 2):  # PNG and GIF decode the same plane
        assert rows[aid]["src_width"] == w and rows[aid]["src_height"] == h
        assert rows[aid]["luma_sum"] == int(want.astype(np.int64).sum())
        assert rows[aid]["luma_peak"] == int(want.max())
    assert rows[3]["luma_sum"] == 99 * out_w * out_h  # constant block
    for aid in (4, 5):  # corrupt + NULL degrade to the sentinel
        assert rows[aid]["src_width"] == 0 and rows[aid]["luma_sum"] == 0


def test_resize_identity_and_upscale(spark):
    import numpy as np

    from world_vaccination_coverage_etl_spark.operators.multimodal import (
        resize_image_batch,
    )
    from world_vaccination_coverage_etl_spark.operators.png_codec import (
        png_encode,
    )

    w, h = 3, 2
    plane = np.array([[10, 20, 30], [40, 50, 60]], dtype=np.uint8)
    df = spark.createDataFrame(
        [(1, "image/png", bytearray(png_encode(w, h, plane.tobytes(), color_type=0)))],
        "asset_id long, mime string, payload binary",
    )
    # identity resize reproduces the plane's stats
    r = resize_image_batch(df, out_w=3, out_h=2).collect()[0]
    assert (r["luma_sum"], r["luma_peak"]) == (210, 60)
    # 2x nearest upscale replicates every pixel 4x
    r = resize_image_batch(df, out_w=6, out_h=4).collect()[0]
    assert (r["luma_sum"], r["luma_peak"]) == (840, 60)
