"""Multimodal plumbing tests: Arrow batch iteration, metadata-driven
frame planning, stubbed decode contract."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from aws_etl_spark.multimodal.binary_ops import (
    PAYLOAD_SCHEMA,
    byte_features,
    decode_image,
    frame_sample_plan,
    repartition_by_size,
)


def _payload_df(spark):
    rows = [
        (1, b"\x00\x01\x02\x03", ("image/png", 2, 2, None)),
        (2, b"\xff" * 1000, ("video/mp4", 640, 480, 3500)),
        (3, None, (None, None, None, None)),
    ]
    return spark.createDataFrame(rows, PAYLOAD_SCHEMA)


def test_byte_features_deterministic_and_null_safe(spark):
    df = _payload_df(spark)
    out = {r.item_id: r for r in byte_features(df, "item_id", "payload").collect()}
    assert out[1].byte_len == 4
    assert out[1].mean_byte == pytest.approx(1.5)
    assert out[2].byte_len == 1000
    assert out[2].digest is not None and len(out[2].digest) == 32
    assert out[3].byte_len is None and out[3].digest is None


def test_frame_sample_plan_from_metadata(spark):
    df = _payload_df(spark)
    plan = frame_sample_plan(df.filter("item_id = 2"), "item_id", "meta", every_ms=1000)
    ts = sorted(r.frame_ts_ms for r in plan.collect())
    assert ts == [0, 1000, 2000]  # 3500 ms at 1 frame/s → frames at 0,1,2 s


def test_repartition_by_size_preserves_rows(spark):
    df = _payload_df(spark)
    out = repartition_by_size(df, "payload")
    assert out.count() == 3
    assert set(out.columns) == set(df.columns)


def test_decode_stub_contract():
    with pytest.raises(NotImplementedError):
        decode_image(b"\x89PNG")


def test_mapinpandas_path_uses_arrow(spark):
    df = _payload_df(spark)
    plan = byte_features(df, "item_id", "payload")._jdf.queryExecution().executedPlan().toString()
    assert "MapInPandas" in plan


def test_sniff_media_metadata(spark):
    """Header sniffing extracts real dimensions from crafted PNG/GIF/
    BMP/JPEG payloads — no codec library involved."""
    import struct

    from aws_etl_spark.multimodal.binary_ops import sniff_media_metadata

    png = (b"\x89PNG\r\n\x1a\n" + struct.pack(">I", 13) + b"IHDR"
           + struct.pack(">II", 640, 480) + b"\x08\x02\x00\x00\x00" + b"\x00" * 8)
    gif = b"GIF89a" + struct.pack("<HH", 320, 200) + b"\x00" * 8
    bmp = b"BM" + b"\x00" * 16 + struct.pack("<ii", 1024, 768) + b"\x00" * 8
    # minimal JPEG: SOI, APP0 (16 bytes), SOF0 with h=600 w=800
    jpeg = (b"\xff\xd8" + b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00" + b"\x00" * 9
            + b"\xff\xc0" + struct.pack(">H", 11) + b"\x08" + struct.pack(">HH", 600, 800)
            + b"\x01" + b"\x00" * 3)
    junk = b"not an image at all, just bytes"
    rows = [(1, bytearray(png)), (2, bytearray(gif)), (3, bytearray(bmp)),
            (4, bytearray(jpeg)), (5, bytearray(junk)), (6, None)]
    df = spark.createDataFrame(rows, "item_id long, payload binary")
    got = {r.item_id: (r.mime, r.width, r.height)
           for r in sniff_media_metadata(df, "item_id", "payload").collect()}
    assert got[1] == ("image/png", 640, 480)
    assert got[2] == ("image/gif", 320, 200)
    assert got[3] == ("image/bmp", 1024, 768)
    assert got[4] == ("image/jpeg", 800, 600)
    assert got[5] == ("application/octet-stream", None, None)
    assert got[6] == (None, None, None)


def test_resize_images_fake_decoder_shape_and_determinism(spark):
    from aws_etl_spark.multimodal.binary_ops import resize_images

    df = spark.createDataFrame(
        [(1, bytes(range(256))), (2, b"\x80" * 100), (3, b"")],
        ["item_id", "content"],
    )
    out = resize_images(df, "item_id", "content", width=8, height=4)
    rows = {r.item_id: r for r in out.collect()}
    assert set(rows) == {1, 2, 3}
    for r in rows.values():
        assert (r.width, r.height) == (8, 4)
        assert len(r.pixels) == 32
    assert rows[2].mean_px == 128.0  # constant-byte payload
    # byte-deterministic across runs
    again = {r.item_id: r.pixels for r in
             resize_images(df, "item_id", "content", width=8, height=4).collect()}
    assert {k: v.pixels for k, v in rows.items()} == again


def test_resize_images_decoder_pluggable(spark):
    import numpy as np

    from aws_etl_spark.multimodal.binary_ops import resize_images

    def all_sevens(payload, w, h):
        return np.full((h, w), 7, dtype=np.uint8)

    df = spark.createDataFrame([(1, b"x")], ["item_id", "content"])
    row = resize_images(
        df, "item_id", "content", width=4, height=4, decoder=all_sevens
    ).first()
    assert row.mean_px == 7.0 and set(row.pixels) == {7}
    # a custom decoder that returns (without its own status tuple) is
    # trusted as a real decode
    assert row.decode_ok is True


def test_resize_images_flags_fallback_decodes(spark):
    """decode_ok surfaces the auto decoder's fake-substitution instead
    of letting corrupt/undecodable payloads masquerade as real pixels
    (advice item: silent fallback was invisible to downstream dedup)."""
    from aws_etl_spark.multimodal.binary_ops import resize_images

    df = spark.createDataFrame(
        [(1, b"definitely not an image")], ["item_id", "content"]
    )
    row = resize_images(df, "item_id", "content", width=4, height=4).first()
    # this payload decodes under no codec: with or without Pillow the
    # fallback fires and must be flagged (environment here is
    # codec-less, but the assertion holds either way)
    assert row.decode_ok is False

    # a decoder returning its own (array, ok) tuple passes it through
    import numpy as np

    def flagged(payload, w, h):
        return np.full((h, w), 3, dtype=np.uint8), False

    row2 = resize_images(
        df, "item_id", "content", width=4, height=4, decoder=flagged
    ).first()
    assert row2.decode_ok is False and set(row2.pixels) == {3}


def test_resize_images_status_survives_decoder_wrapping(spark):
    """The decode_ok contract is value-based (tuple passthrough), not
    object-identity-based: wrapping the status decoder in a partial or
    lambda must still report the fallback (advice item: the identity
    check `decoder is decode_image_auto` silently reported True for
    any wrapper)."""
    import functools

    from aws_etl_spark.multimodal.binary_ops import (
        decode_image_status,
        resize_images,
    )

    df = spark.createDataFrame(
        [(1, b"definitely not an image")], ["item_id", "content"]
    )
    for wrapped in (
        functools.partial(decode_image_status),
        lambda p, w, h: decode_image_status(p, w, h),
    ):
        row = resize_images(
            df, "item_id", "content", width=4, height=4, decoder=wrapped
        ).first()
        assert row.decode_ok is False


def test_extract_frames_plumbing(spark):
    """Frame sampling: one row per planned frame, features computed
    from the decoded window; deterministic across runs; null payload
    yields null features but keeps the plan rows."""
    import zlib

    from pyspark.sql import Row, functions as F

    from aws_etl_spark.multimodal.binary_ops import (
        default_frame_decoder,
        extract_frames,
    )

    payload = bytes(range(256)) * 40  # 10240 bytes
    df = spark.createDataFrame(
        [
            Row(item_id=1, payload=payload,
                meta=Row(duration_ms=3500)),
            Row(item_id=2, payload=None,
                meta=Row(duration_ms=1500)),
        ]
    )
    out = extract_frames(df, "item_id", "payload", "meta", every_ms=1000)
    rows = {(r.item_id, r.frame_idx): r for r in out.collect()}
    assert len(rows) == 3 + 1  # 3500ms→3 frames; null payload→max(nf,1)=1
    f0 = rows[(1, 0)]
    expected = default_frame_decoder(payload, 0)
    assert f0.n_bytes == len(expected)
    assert f0.byte_crc == zlib.crc32(expected)
    assert abs(f0.byte_mean - sum(expected) / len(expected)) < 1e-9
    assert rows[(2, 0)].n_bytes is None
    # run twice → identical (no RNG state)
    again = {(r.item_id, r.frame_idx): r.byte_crc for r in out.collect()}
    assert again == {k: v.byte_crc for k, v in rows.items()}


def test_parse_wav_headers(spark):
    """Real RIFF/WAVE header parsing on synthetic audio bytes."""
    import struct

    from pyspark.sql import Row

    from aws_etl_spark.multimodal.binary_ops import parse_wav_headers

    def wav_bytes(n_ch=2, rate=16000, bits=16, n_samples=16000):
        data_len = n_samples * n_ch * bits // 8
        fmt = struct.pack(
            "<4sIHHIIHH", b"fmt ", 16, 1, n_ch, rate,
            rate * n_ch * bits // 8, n_ch * bits // 8, bits,
        )
        data = b"data" + struct.pack("<I", data_len) + b"\x00" * data_len
        body = b"WAVE" + fmt + data
        return b"RIFF" + struct.pack("<I", len(body)) + body

    df = spark.createDataFrame(
        [
            Row(item_id=1, payload=wav_bytes()),
            Row(item_id=2, payload=b"\x89PNG not audio"),
            Row(item_id=3, payload=None),
        ]
    )
    got = {r.item_id: r for r in parse_wav_headers(df, "item_id", "payload").collect()}
    assert got[1].is_wav and got[1].n_channels == 2
    assert got[1].sample_rate_hz == 16000
    assert got[1].bits_per_sample == 16
    assert got[1].duration_ms == 1000  # 16000 samples at 16 kHz
    assert not got[2].is_wav and got[2].sample_rate_hz is None
    assert not got[3].is_wav


def test_jpeg_walk_fill_bytes_and_standalone_markers():
    """ADVICE r2: the marker walk must skip 0xFF fill padding and
    advance standalone markers (TEM, RSTn) without reading a bogus
    length word."""
    import struct

    from aws_etl_spark.multimodal.binary_ops import _sniff_one

    sof = (b"\xff\xc0" + struct.pack(">H", 11) + b"\x08"
           + struct.pack(">HH", 600, 800) + b"\x01" + b"\x00" * 3)
    # fill bytes between segments: ...FF FF FF C0 ...
    padded = b"\xff\xd8" + b"\xff\xff" + sof
    assert _sniff_one(padded) == ("image/jpeg", 800, 600)
    # standalone TEM (0x01) and RST0 (0xD0) before the SOF: no length
    # word — the old walk read garbage seg_len and jumped past SOF
    standalone = b"\xff\xd8" + b"\xff\x01" + b"\xff\xd0" + sof
    assert _sniff_one(standalone) == ("image/jpeg", 800, 600)
    # malformed length word (< 2) must terminate, not loop/crash
    malformed = b"\xff\xd8" + b"\xff\xe0" + struct.pack(">H", 1) + b"\x00" * 8
    assert _sniff_one(malformed) == ("image/jpeg", None, None)


def test_frame_sample_plan_corrupt_duration_capped(spark):
    """ADVICE r2: a corrupt/huge duration_ms must not fan one item out
    into ~2^31 rows — the plan is computed in BIGINT and clamped to
    max_frames, same hardening as extract_frames."""
    rows = [(1, None, (None, None, None, 2**62))]
    df = spark.createDataFrame(rows, PAYLOAD_SCHEMA)
    plan = frame_sample_plan(df, "item_id", "meta", every_ms=1000, max_frames=50)
    assert plan.count() == 50


def test_decode_image_auto_falls_back_without_codec(spark):
    """decode_image_auto must produce the deterministic fake when no
    codec library exists (this environment), keeping resize_images
    runnable everywhere; with Pillow present it decodes for real."""
    import numpy as np

    from aws_etl_spark.multimodal.binary_ops import (
        _pillow,
        decode_image_auto,
        decode_image_fake,
    )

    out = decode_image_auto(b"\x01\x02\x03", 8, 8)
    if _pillow() is None:
        assert np.array_equal(out, decode_image_fake(b"\x01\x02\x03", 8, 8))
    assert out.shape[0] > 0


def test_dhash_deterministic_and_perturbation_robust(spark):
    """dHash over the render decode: identical payloads → identical
    hash; a small text edit → small Hamming distance; unrelated
    payloads → far apart."""
    from pyspark.sql import functions as F

    from aws_etl_spark.multimodal.binary_ops import (
        decode_render_fake,
        dhash64,
    )

    base = " ".join(f"w{i}" for i in range(80))
    near = base.replace("w40", "edited")
    far = " ".join(f"z{i}" for i in range(80))
    df = spark.createDataFrame(
        [(1, base), (2, base), (3, near), (4, far)],
        "item_id long, text string",
    ).select(
        "item_id",
        F.col("text").cast("binary").alias("payload"),
        F.lit(18).alias("width"),
        F.lit(16).alias("height"),
    )
    sigs = {
        r["item_id"]: r["phash"]
        for r in dhash64(
            df, "item_id", "payload", "width", "height",
            decoder=decode_render_fake,
        ).collect()
    }
    ham = lambda a, b: bin((a ^ b) & ((1 << 64) - 1)).count("1")
    assert sigs[1] == sigs[2]
    assert ham(sigs[1], sigs[3]) <= 3
    assert ham(sigs[1], sigs[4]) > 6


def test_phash_banded_equals_bruteforce(spark, sf_dir):
    """The banded Hamming join (pigeonhole chunks) finds EXACTLY the
    pairs a brute-force all-pairs Hamming scan finds — candidate
    generation loses nothing at distance < chunks."""
    from itertools import combinations

    from aws_etl_spark.queries.registry import REGISTRY, _ensure_loaded, load_table
    from pyspark.sql import functions as F

    from aws_etl_spark.dedup.simhash import (
        hamming_near_dup_pairs,
        oversize_bucket_count,
    )
    from aws_etl_spark.multimodal.binary_ops import decode_render_fake, dhash64

    _ensure_loaded()
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        F.col("text").cast("binary").alias("payload"),
        F.lit(18).alias("width"),
        F.lit(16).alias("height"),
    )
    sigs = dhash64(
        docs, "doc_id", "payload", "width", "height",
        decoder=decode_render_fake,
    ).cache()
    # exactness PRECONDITION, asserted not assumed: the pigeonhole
    # guarantee only holds with zero truncated buckets — if this data
    # ever grows a degenerate chunk bucket, fail here with the cause
    # rather than in the set comparison below
    assert (
        oversize_bucket_count(sigs, id_col="item_id", sig_col="phash")
        == 0
    ), "banded==brute precondition violated: oversize bucket(s) truncated"
    banded = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in hamming_near_dup_pairs(
            sigs, id_col="item_id", sig_col="phash", max_distance=3, chunks=4
        ).collect()
    }
    local = {r["item_id"]: r["phash"] for r in sigs.collect()}
    ham = lambda a, b: bin((a ^ b) & ((1 << 64) - 1)).count("1")
    brute = {
        (a, b): ham(local[a], local[b])
        for a, b in combinations(sorted(local), 2)
        if ham(local[a], local[b]) <= 3
    }
    assert banded == brute


def test_phash_exact_twin_preconditions(spark):
    """multimodal_phash_neardup_exact's brute-force oracle equals the
    banded Spark join only while no (chunk, value) bucket overflows
    the cap — assert that precondition on every graded corpus, and pin
    the md5 renderer against a hand-computed reference cell so a
    hashlib/slicing drift fails with a named cause."""
    import glob
    import hashlib

    import numpy as np

    from aws_etl_spark.dedup.simhash import oversize_bucket_count
    from aws_etl_spark.multimodal.binary_ops import decode_render_md5, dhash64
    from aws_etl_spark.queries.registry import load_table

    # hand reference: one gram "a b c" lands in exactly one cell
    img = decode_render_md5(b"a b c", 18, 16)
    cell = int(hashlib.md5(b"a b c").hexdigest()[:8], 16) % 288
    expect = np.zeros(288, dtype=np.uint8)
    expect[cell] = 255
    assert (img.ravel() == expect).all()

    for sf in sorted(glob.glob("/root/testdata/sf*")):
        docs = load_table(spark, sf, "documents").select(
            "doc_id", F.col("text").cast("binary").alias("payload"),
            F.lit(18).alias("width"), F.lit(16).alias("height"),
        )
        sigs = dhash64(
            docs, "doc_id", "payload", "width", "height",
            decoder=decode_render_md5,
        )
        n = oversize_bucket_count(
            sigs, "item_id", "phash", chunks=4, max_bucket=1000
        )
        assert n == 0, f"{sf}: {n} oversize phash buckets break exactness"
