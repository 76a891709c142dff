"""Multimodal binary-column plumbing: schemas, Arrow batch shapes,
one-to-many frame explosion, and the stubbed codec boundary."""

import pytest
from pyspark.sql import Row, functions as F

from updater_spark.operators.multimodal import (
    decode_features,
    make_blob_table,
    real_decode_stub,
    resize_images,
    sample_frames,
)


@pytest.fixture(scope="module")
def blobs(spark):
    docs = spark.createDataFrame(
        [Row(doc_id=i, text="word " * (10 + i)) for i in range(1, 7)]
    )
    return make_blob_table(docs)


def test_blob_schema(blobs):
    assert dict(blobs.dtypes) == {
        "doc_id": "bigint",
        "payload": "binary",
        "media_type": "string",
        "n_bytes": "bigint",
    }
    r = blobs.filter(F.col("doc_id") == 3).collect()[0]
    assert r["media_type"] == "image/png"
    assert len(r["payload"]) == r["n_bytes"]


def test_decode_features_deterministic(blobs):
    a = {r["doc_id"]: r["byte_mean"] for r in decode_features(blobs).collect()}
    b = {r["doc_id"]: r["byte_mean"] for r in decode_features(blobs).collect()}
    assert a == b and len(a) == 6


def test_resize_contract(blobs):
    out = resize_images(blobs, width=8, height=4).collect()
    assert len(out) == 6
    for r in out:
        assert len(r["payload"]) <= 8 * 4
        assert (r["width"], r["height"]) == (8, 4)


def test_frame_sampling_explodes(blobs):
    frames = sample_frames(blobs, n_frames=3)
    assert frames.count() == 6 * 3
    per_doc = (
        frames.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n")).collect()
    )
    assert all(r["n"] == 3 for r in per_doc)
    idx = {r["frame_idx"] for r in frames.select("frame_idx").distinct().collect()}
    assert idx == {0, 1, 2}


def test_real_codec_is_explicitly_stubbed():
    with pytest.raises(NotImplementedError):
        real_decode_stub(b"\x89PNG", "image/png")


def test_resize_images_pil_codec(spark):
    """The REAL Pillow resize path — skips (naming the dependency)
    in environments without Pillow, runs automatically wherever the
    env gains it. The stub codec and its byte-exact oracle are
    untouched by this branch."""
    import pytest

    PIL = pytest.importorskip("PIL")  # noqa: F841
    import io

    from PIL import Image

    from updater_spark.operators.multimodal import resize_images

    def png(w, h, color):
        buf = io.BytesIO()
        Image.new("RGB", (w, h), color).save(buf, format="PNG")
        return buf.getvalue()

    blobs = spark.createDataFrame(
        [
            (1, png(64, 48, (255, 0, 0)), "image/png", 0),
            (2, png(16, 16, (0, 128, 255)), "image/png", 0),
        ],
        "doc_id long, payload binary, media_type string, n_bytes long",
    )
    out = resize_images(blobs, width=8, height=4, codec="pil").collect()
    assert len(out) == 2
    for r in out:
        img = Image.open(io.BytesIO(bytes(r["payload"])))
        assert img.size == (8, 4)
        assert (r["width"], r["height"]) == (8, 4)


def test_resize_images_pil_codec_missing_fails_fast(spark):
    """Without Pillow, codec='pil' must fail at PLAN BUILD on the
    driver with a clear ImportError naming the dependency — not an
    executor-side stack at action time."""
    import pytest

    try:
        import PIL  # noqa: F401

        pytest.skip("Pillow installed; missing-dependency path untestable")
    except ImportError:
        pass
    from updater_spark.operators.multimodal import make_blob_table, resize_images

    docs = spark.createDataFrame([(1, "abc")], "doc_id long, text string")
    with pytest.raises(ImportError, match="Pillow"):
        resize_images(make_blob_table(docs), codec="pil")


def test_resize_images_rejects_unknown_codec(spark):
    import pytest

    from updater_spark.operators.multimodal import make_blob_table, resize_images

    docs = spark.createDataFrame([(1, "abc")], "doc_id long, text string")
    with pytest.raises(ValueError, match="codec"):
        resize_images(make_blob_table(docs), codec="ffmpeg")


def _py_ahash(b: bytes, grid: int = 8) -> int:
    target = grid * grid
    px = list(b[: : max(1, len(b) // target)][:target])
    if not px:
        return 0
    m = sum(px) / len(px)
    h = 0
    for j, p in enumerate(px):
        if p > m:
            h |= 1 << j
    return h - (1 << 64) if h >= 1 << 63 else h


def test_image_ahash_matches_python_oracle(spark):
    from updater_spark.operators.multimodal import image_ahash, make_blob_table

    rows = [(i, f"payload number {i} " * (i + 1)) for i in range(12)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["ahash"], r["n_px"])
        for r in image_ahash(make_blob_table(docs)).collect()
    }
    for i, t in rows:
        b = t.encode("utf-8")
        want_px = len(b[: : max(1, len(b) // 64)][:64])
        assert got[i] == (_py_ahash(b), want_px), i


def test_image_neardup_banding_equals_exact(spark):
    """The pigeonhole guarantee in practice: the banded candidate
    path finds EVERY pair the quadratic Hamming join finds at
    max_hamming < chunks."""
    from updater_spark.operators.multimodal import (
        image_ahash,
        image_neardup_pairs,
        make_blob_table,
    )

    base = [(i, f"some repeated image payload {i % 4} tail") for i in range(30)]
    # planted near-dups: same length, first char case-flipped
    planted = [(100 + i, t.capitalize()) for i, t in base[:10]]
    docs = spark.createDataFrame(
        base + planted, "doc_id long, text string"
    )
    hashes = image_ahash(make_blob_table(docs))
    banded = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in image_neardup_pairs(hashes, max_hamming=8, chunks=16).collect()
    }
    rows = {r["doc_id"]: r["ahash"] for r in hashes.collect()}
    exact = {}
    ids = sorted(rows)
    for x in ids:
        for y in ids:
            if x < y:
                d = bin((rows[x] ^ rows[y]) & ((1 << 64) - 1)).count("1")
                if d <= 8:
                    exact[(x, y)] = d
    assert banded == exact
    # the planted clones are found
    for i, _ in base[:10]:
        assert (i, 100 + i) in banded


def test_image_neardup_rejects_broken_pigeonhole(spark):
    import pytest

    from updater_spark.operators.multimodal import (
        image_ahash,
        image_neardup_pairs,
        make_blob_table,
    )

    docs = spark.createDataFrame([(1, "abc")], "doc_id long, text string")
    hashes = image_ahash(make_blob_table(docs))
    with pytest.raises(ValueError, match="pigeonhole"):
        image_neardup_pairs(hashes, max_hamming=16, chunks=16)


def test_image_ahash_pil_codec(spark):
    import pytest

    pytest.importorskip("PIL")
    import io

    from PIL import Image

    from updater_spark.operators.multimodal import image_ahash

    def png(shade: int) -> bytes:
        img = Image.new("L", (16, 16), color=shade)
        # one bright quadrant so the hash has structure
        for x in range(8):
            for y in range(8):
                img.putpixel((x, y), 255)
        buf = io.BytesIO()
        img.save(buf, format="PNG")
        return buf.getvalue()

    df = spark.createDataFrame(
        [(1, png(10)), (2, png(12))], "doc_id long, payload binary"
    )
    out = {r["doc_id"]: r["ahash"] for r in image_ahash(df, codec="pil").collect()}
    # near-identical images -> near-identical hashes
    d = bin((out[1] ^ out[2]) & ((1 << 64) - 1)).count("1")
    assert d <= 4


def test_image_neardup_max_bucket_guard(spark):
    """The skew guard: a degenerate exact-dup cluster (identical
    payloads -> identical hashes -> one giant bucket) is dropped at
    max_bucket, while near-dup pairs in small buckets survive — the
    lsh_candidate_pairs contract carried to Hamming banding."""
    from updater_spark.operators.multimodal import (
        image_ahash,
        image_neardup_pairs,
        make_blob_table,
    )

    boiler = [(1000 + i, "identical boilerplate image payload") for i in range(40)]
    diverse = [(i, f"diverse payload {i} with tail {i * 7}") for i in range(10)]
    planted = [(100 + i, t.capitalize()) for i, t in diverse[:5]]
    docs = spark.createDataFrame(
        boiler + diverse + planted, "doc_id long, text string"
    )
    hashes = image_ahash(make_blob_table(docs))
    capped = {
        (r["id_a"], r["id_b"])
        for r in image_neardup_pairs(
            hashes, max_hamming=6, chunks=8, max_bucket=20
        ).collect()
    }
    # no pair between two boilerplate clones survives the cap
    assert not any(a >= 1000 and b >= 1000 for a, b in capped)
    # the small-bucket planted pairs all survive
    for i, _ in diverse[:5]:
        assert (i, 100 + i) in capped
    # uncapped finds the boilerplate cluster too (exact semantics)
    full = {
        (r["id_a"], r["id_b"])
        for r in image_neardup_pairs(
            hashes, max_hamming=6, chunks=8
        ).collect()
    }
    assert (1000, 1001) in full and capped < full


def _py_dhash(b: bytes, grid: int = 8) -> int:
    target = grid * (grid + 1)
    px = list(b[:: max(1, len(b) // target)][:target])
    h = 0
    for j in range(grid * grid):
        li = (j // grid) * (grid + 1) + (j % grid)
        if li + 1 < len(px) and px[li + 1] > px[li]:
            h |= 1 << j
    return h - (1 << 64) if h >= 1 << 63 else h


def test_image_dhash_matches_python_oracle(spark):
    from updater_spark.operators.multimodal import image_dhash, make_blob_table

    rows = [(i, f"payload number {i} " * (i + 1)) for i in range(12)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["dhash"], r["n_px"])
        for r in image_dhash(make_blob_table(docs)).collect()
    }
    for i, t in rows:
        b = t.encode("utf-8")
        want_px = len(b[:: max(1, len(b) // 72)][:72])
        assert got[i] == (_py_dhash(b), want_px), i


def test_image_dhash_robust_where_ahash_flips(spark):
    """The dHash robustness claim: brightening ONE region of the
    image moves the global mean, so aHash flips bits in UNTOUCHED
    regions too; dHash's neighbor-gradient bits flip only where the
    edit is. Payload = 72 deterministic bytes (stride 1 — pseudo
    pixels ARE the bytes); edit = +60 on bytes 0..17 (rows 0-1)."""
    from pyspark.sql import functions as F

    from updater_spark.operators.multimodal import image_dhash, image_ahash

    base = bytes((i * 7) % 120 + 20 for i in range(72))
    lit = bytes(min(b + 60, 255) for b in base[:18]) + base[18:]
    df = spark.createDataFrame(
        [(1, bytearray(base)), (2, bytearray(lit))],
        "doc_id long, payload binary",
    )
    d = {r["doc_id"]: r["dhash"] for r in image_dhash(df).collect()}
    a = {r["doc_id"]: r["ahash"] for r in image_ahash(df).collect()}
    mask = (1 << 64) - 1
    d_ham = bin((d[1] ^ d[2]) & mask).count("1")
    a_ham = bin((a[1] ^ a[2]) & mask).count("1")
    # dHash damage is confined to rows 0-1 (bits 0..15): 48 bits of
    # untouched rows identical
    assert (d[1] ^ d[2]) & mask < (1 << 16), hex(d[1] ^ d[2])
    # aHash flips bits OUTSIDE the edited region (mean moved)
    assert (a[1] ^ a[2]) & mask >= (1 << 16), hex(a[1] ^ a[2])
    assert d_ham < a_ham, (d_ham, a_ham)


def test_image_dhash_banding_via_hash_col(spark):
    """image_neardup_pairs(hash_col='dhash') bands dHash output the
    same way: planted same-length case-flip clones are found and the
    banded set equals the exact quadratic join."""
    from updater_spark.operators.multimodal import (
        image_dhash,
        image_neardup_pairs,
        make_blob_table,
    )

    base = [(i, f"some repeated image payload {i % 4} tail") for i in range(30)]
    planted = [(100 + i, t.capitalize()) for i, t in base[:10]]
    docs = spark.createDataFrame(base + planted, "doc_id long, text string")
    hashes = image_dhash(make_blob_table(docs))
    banded = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in image_neardup_pairs(
            hashes, max_hamming=8, chunks=16, hash_col="dhash"
        ).collect()
    }
    rows = {r["doc_id"]: r["dhash"] for r in hashes.collect()}
    exact = {}
    ids = sorted(rows)
    for x in ids:
        for y in ids:
            if x < y:
                h = bin((rows[x] ^ rows[y]) & ((1 << 64) - 1)).count("1")
                if h <= 8:
                    exact[(x, y)] = h
    assert banded == exact


def test_simhash_banding_warns_on_uniform_blowup(spark):
    """warn_expansion ergonomics: a low threshold + no max_bucket
    fires the RuntimeWarning naming the fix; passing max_bucket or
    warn_expansion=None keeps it silent."""
    import warnings

    from updater_spark.operators.dedup import simhash_near_pairs

    # 60 identical fingerprints: Σ bucket² = 16 chunks · 60² = 57600
    fps = spark.range(60).select(
        F.col("id"), F.lit(12345).cast("long").alias("simhash")
    )
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        simhash_near_pairs(fps, max_hamming=3, chunks=16,
                           warn_expansion=1000)
        assert any("max_bucket" in str(x.message) for x in w), [
            str(x.message) for x in w]
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        simhash_near_pairs(fps, max_hamming=3, chunks=16,
                           max_bucket=100, warn_expansion=1000).count()
        simhash_near_pairs(fps, max_hamming=3, chunks=16,
                           warn_expansion=None).count()
        assert not [x for x in w if issubclass(x.category, RuntimeWarning)]
