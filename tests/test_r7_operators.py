"""Round-7 operator laws: the streaming IVF maintainer (drift-triggered
auto-rebalance), the append report's per-list counts, and the
fixed-merge encoder entry's literal table."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


def _mk_clusters(spark, dim=8, per=25):
    """4 well-separated axis clusters, no plants — a balanced index."""
    import random

    rng = random.Random(3)
    rows = []
    vid = 0
    for c in range(4):
        for _ in range(per):
            v = [rng.uniform(-0.05, 0.05) for _ in range(dim)]
            v[c] = 1.0 + rng.uniform(0, 0.1)
            rows.append((vid, v))
            vid += 1
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def _plants(spark, n, start_id, dim=8):
    rows = []
    for i in range(n):
        v = [0.0] * dim
        v[0] = 1.0 + i / 1000.0  # one direction -> one list
        v[1] = 0.3 * (i % 7) / 7.0  # enough spread for a clean 2-split
        rows.append((start_id + i, v))
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def _list_sizes(spark, path):
    return {
        int(r["list_id"]): int(r["n"])
        for r in spark.read.parquet(path + "/lists")
        .groupBy("list_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }


def test_append_report_list_counts(spark, tmp_path):
    """append_ivf_index's list_counts must sum to the batch size and
    agree with the actual partition growth (the zero-extra-scan fact
    the streaming maintainer's trigger is built on)."""
    from spark_alchemy_spark.operators.similarity import (
        append_ivf_index,
        build_ivf_index,
    )

    df = _mk_clusters(spark)
    path = str(tmp_path / "idx")
    build_ivf_index(df, "vec_id", "embedding", path, n_centroids=4)
    before = _list_sizes(spark, path)
    batch = _plants(spark, 10, 50_000)
    rep = append_ivf_index(batch, "vec_id", "embedding", path)
    assert sum(rep["list_counts"].values()) == rep["n_appended"] == 10
    after = _list_sizes(spark, path)
    for lid, n in rep["list_counts"].items():
        assert after[lid] == before.get(lid, 0) + n


def test_streaming_maintainer_tracks_and_trips(spark, tmp_path):
    """The maintainer's driver-side sizes must equal the real list
    sizes after every batch (zero index scans on the no-split path),
    the rebalance must fire exactly when the hot list crosses
    trigger_ratio x mean — not before — and batches appended AFTER the
    split must land on the post-split layout."""
    from spark_alchemy_spark.operators.similarity import (
        build_ivf_index,
        ivf_topk_indexed,
        make_streaming_ivf_maintainer,
    )

    df = _mk_clusters(spark)  # 100 rows, 4 lists of ~25
    path = str(tmp_path / "idx")
    build_ivf_index(df, "vec_id", "embedding", path, n_centroids=4)
    maintain, log = make_streaming_ivf_maintainer(
        spark, path, trigger_ratio=2.0, split_ratio=2.0
    )
    # batch 1: +20 plants -> hot ~45 of 120, mean 30, 45 < 60: no trip
    maintain(_plants(spark, 20, 50_000), 0)
    assert not log[0]["rebalanced"]
    assert log[0]["max_share_ppm"] == max(
        _list_sizes(spark, path).values()
    ) * 1_000_000 // 120
    # batch 2: +40 plants -> hot ~85 of 160, mean 40, 85 > 80: trips
    maintain(_plants(spark, 40, 60_000), 1)
    assert log[1]["rebalanced"]
    rb = log[1]["rebalance_report"]
    assert rb["n_split"] >= 1
    assert rb["max_share_after_ppm"] < rb["max_share_before_ppm"]
    # post-split bookkeeping re-seeded exactly
    sizes = _list_sizes(spark, path)
    assert log[1]["max_share_ppm"] == max(sizes.values()) * 1_000_000 // sum(
        sizes.values()
    )
    # batch 3: appends land on the post-split layout (5 lists now)
    maintain(_plants(spark, 10, 70_000), 2)
    assert set(_list_sizes(spark, path)) == set(sizes)
    total = sum(_list_sizes(spark, path).values())
    assert total == 100 + 20 + 40 + 10  # conservation across the split
    # probe-all still reduces to brute force: the planted direction's
    # nearest neighbors are other plants at cosine ~1
    q = _plants(spark, 1, 99_000)
    top = ivf_topk_indexed(
        spark, path, q, "vec_id", "embedding", k=3, nprobe=len(sizes)
    ).collect()
    assert top and all(float(r["cos"]) >= 0.95 for r in top)


def test_maintainer_no_trip_stays_cheap(spark, tmp_path):
    """Balanced appends never trigger: every log entry reports
    rebalanced=False and the layout keeps its original list ids."""
    from spark_alchemy_spark.operators.similarity import (
        build_ivf_index,
        make_streaming_ivf_maintainer,
    )

    df = _mk_clusters(spark)
    path = str(tmp_path / "idx")
    build_ivf_index(df, "vec_id", "embedding", path, n_centroids=4)
    lists_before = set(_list_sizes(spark, path))
    maintain, log = make_streaming_ivf_maintainer(
        spark, path, trigger_ratio=2.0
    )
    maintain(_mk_clusters(spark).select(
        (F.col("vec_id") + 80_000).alias("vec_id"), "embedding"
    ), 0)
    assert log and not log[0]["rebalanced"]
    assert log[0]["rebalance_report"] is None
    assert set(_list_sizes(spark, path)) == lists_before


def test_fixed32_merge_table_is_wellformed():
    """The literal merge table: 32 entries, hex-symbol strings, and
    every compound symbol is constructible from an EARLIER merge (the
    encoder contract — a symbol no earlier merge can build would make
    its rule dead on every input)."""
    from spark_alchemy_spark.queries_r7 import _FIXED_MERGES_32

    assert len(_FIXED_MERGES_32) == 32
    built = set()
    for lhs, rhs in _FIXED_MERGES_32:
        for side in (lhs, rhs):
            assert side and len(side) % 2 == 0
            assert all(c in "0123456789ABCDEF" for c in side)
            if len(side) > 2:
                assert side in built, f"symbol {side} used before built"
        built.add(lhs + rhs)


# ---------------------------------------------------------------------------
# Pure-stdlib PNG codec (VERDICT r6 task 8)
# ---------------------------------------------------------------------------


def _rand_img(rng, h, w, c):
    import numpy as np

    return np.array(
        [[[rng.randrange(256) for _ in range(c)] for _ in range(w)]
         for _ in range(h)],
        dtype=np.uint8,
    )


@pytest.mark.parametrize("filter_type", [0, 1, 2, 3, 4])
@pytest.mark.parametrize("channels", [1, 2, 3, 4])
def test_png_roundtrip_all_filters_and_channels(filter_type, channels):
    """decode(encode(img, f)) == img for every scanline filter and
    every supported channel count — the five filter-reversal paths are
    each exercised against the forward filter (public PNG spec)."""
    import random

    import numpy as np

    from spark_alchemy_spark.multimodal import png_decode, png_encode

    rng = random.Random(100 * filter_type + channels)
    img = _rand_img(rng, 7, 5, channels)
    buf = png_encode(img, filter_type=filter_type)
    out = png_decode(buf)
    assert out.shape == (7, 5, channels)
    assert np.array_equal(out, img)


def test_png_decode_rejects_unsupported():
    import numpy as np

    from spark_alchemy_spark.multimodal import _PNG_SIG, png_decode, png_encode

    with pytest.raises(ValueError, match="not a PNG"):
        png_decode(b"JUNKJUNKJUNK")
    # 16-bit depth: patch the encoder's IHDR depth byte
    buf = bytearray(png_encode(_rand_img(__import__("random").Random(1), 3, 3, 3)))
    # IHDR data starts at 8(+8 len/type); depth is byte 8 of the data
    depth_pos = 8 + 8 + 8
    assert buf[depth_pos] == 8
    buf[depth_pos] = 16
    with pytest.raises(NotImplementedError, match="depth=16"):
        png_decode(bytes(buf))
    assert png_encode(np.zeros((2, 2, 3), np.uint8))[:8] == _PNG_SIG


def test_image_features_real_png_equals_synth(spark):
    """The multimodal pipeline on REAL PNG bytes: image_features over
    PNG-encoded pixels must equal image_features over the same pixels
    in the SYNTH container — same interface, same features, different
    (real) container format."""
    import numpy as np

    from spark_alchemy_spark.multimodal import (
        _decode_synth,
        image_features,
        png_encode,
        synth_image_bytes,
    )

    rows_synth, rows_png = [], []
    for i in range(6):
        sb = synth_image_bytes(17 * i, 8, 8)
        img = _decode_synth(sb)
        rows_synth.append((i, bytearray(sb)))
        rows_png.append((i, bytearray(png_encode(img, filter_type=i % 5))))
    synth_df = spark.createDataFrame(rows_synth, "media_id long, data binary")
    png_df = spark.createDataFrame(rows_png, "media_id long, data binary")
    fs = {
        int(r["media_id"]): r
        for r in image_features(synth_df, "data", "media_id").collect()
    }
    fp = {
        int(r["media_id"]): r
        for r in image_features(png_df, "data", "media_id").collect()
    }
    assert set(fs) == set(fp) == set(range(6))
    for i in range(6):
        a, b = fs[i], fp[i]
        assert (a["width"], a["height"], a["channels"]) == (
            b["width"], b["height"], b["channels"],
        )
        assert a["channel_mean"] == b["channel_mean"]
        assert a["embedding"] == b["embedding"]


def test_ahash_real_png_equals_synth(spark):
    """The aHash fingerprint (the media-dedup primitive) must be
    container-agnostic: PNG bytes and SYNTH bytes of the same pixels
    produce the same bits — so the whole image-dedup family works on
    real PNGs through the same decode seam."""
    from spark_alchemy_spark.multimodal import (
        _decode_synth,
        ahash_bits,
        png_encode,
        synth_image_bytes,
    )

    rows_s, rows_p = [], []
    for i in range(5):
        sb = synth_image_bytes(31 * i, 8, 8)
        rows_s.append((i, bytearray(sb)))
        rows_p.append((i, bytearray(png_encode(_decode_synth(sb), i % 5))))
    hs = {
        int(r["media_id"]): r["ahash"]
        for r in ahash_bits(
            spark.createDataFrame(rows_s, "media_id long, data binary"),
            "data", "media_id",
        ).collect()
    }
    hp = {
        int(r["media_id"]): r["ahash"]
        for r in ahash_bits(
            spark.createDataFrame(rows_p, "media_id long, data binary"),
            "data", "media_id",
        ).collect()
    }
    assert hs == hp and len(hs) == 5


def test_fixed32_cross_encoder_equality(spark):
    """The merge-rank encoder and the Catalyst fold encoder must agree
    on the FIXED 32-merge table too (the trained-merge law's twin) —
    including the chained '7468'+'696E' rule that joins two merged
    symbols."""
    from spark_alchemy_spark.operators.bpe import (
        encode_with_merge_ranks,
        encode_with_merges,
    )
    from spark_alchemy_spark.queries_r7 import _FIXED_MERGES_32

    words = spark.createDataFrame(
        [("thinking",), ("the",), ("thin",), ("brothers",), ("outing",),
         ("llama",), ("arrange",), ("z",), ("stout",)],
        "w string",
    )
    a = {
        r["w"]: (r["n_subtokens"], r["syms"])
        for r in encode_with_merge_ranks(
            words, list(_FIXED_MERGES_32), keep_syms=True
        ).collect()
    }
    b = {
        r["w"]: (r["n_subtokens"], r["syms"])
        for r in encode_with_merges(
            words, list(_FIXED_MERGES_32), keep_syms=True
        ).collect()
    }
    assert a == b and len(a) == 9
    # the chained rule actually fired: 'thin' collapsed to ONE symbol
    assert a["thin"][0] == 1 and a["thin"][1] == ["7468696E"]
