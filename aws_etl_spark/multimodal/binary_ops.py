"""Multimodal column support: image/audio/video as opaque binary
columns with typed metadata (north-star §2.13).

Design:

- payloads are ``BinaryType`` columns (from ``binaryFile`` sources or
  in-table blobs) plus a metadata struct (``mime``, ``width``, ...);
- per-item decode / feature-extraction runs as Arrow-batched
  ``mapInPandas`` — the only sanctioned Python hot path in this
  engine, because codec work is genuinely un-expressible in SQL;
- batches stay bounded via ``spark.sql.execution.arrow.maxRecordsPerBatch``
  and payload-size salting (``repartition_by_size``) so one 4K video
  doesn't ride in a batch sized for thumbnails.

The actual codecs (PIL/ffmpeg/soundfile) are NOT in this image, so
``decode_image`` raises ``NotImplementedError`` — the Spark-side
plumbing (schemas, batch iteration, partitioning) is real and tested
with the deterministic byte-level featurizer.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

PAYLOAD_SCHEMA = T.StructType(
    [
        T.StructField("item_id", T.LongType(), False),
        T.StructField("payload", T.BinaryType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("mime", T.StringType(), True),
                    T.StructField("width", T.IntegerType(), True),
                    T.StructField("height", T.IntegerType(), True),
                    T.StructField("duration_ms", T.LongType(), True),
                ]
            ),
            True,
        ),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("item_id", T.LongType(), False),
        T.StructField("byte_len", T.LongType(), True),
        T.StructField("digest", T.StringType(), True),
        T.StructField("mean_byte", T.DoubleType(), True),
    ]
)


def _pillow():
    """Runtime codec detection: return the PIL.Image module when Pillow
    is installed, else None. Detected once per process; worker processes
    each run their own detection, so a heterogenous cluster degrades
    per-executor rather than failing the job."""
    global _PIL_IMAGE
    if _PIL_IMAGE is _PIL_UNSET:
        try:
            from PIL import Image as _img  # type: ignore

            _PIL_IMAGE = _img
        except Exception:
            _PIL_IMAGE = None
    return _PIL_IMAGE


_PIL_UNSET = object()
_PIL_IMAGE: object = _PIL_UNSET


def decode_image(payload: bytes) -> "np.ndarray":
    """Decode an image payload to a (H, W) uint8 grayscale array.

    Uses Pillow when present (real decode); without any codec library
    (this environment ships none) it raises ``NotImplementedError`` —
    callers that need a guaranteed path use :func:`decode_image_fake`
    or :func:`decode_image_status` (which also reports whether the
    fallback fired — prefer it over the status-blind
    :func:`decode_image_auto` anywhere the flag matters)."""
    img_mod = _pillow()
    if img_mod is None:
        raise NotImplementedError(
            "image decoding requires a codec library (e.g. PIL) not "
            "present in this environment; byte-level featurization "
            "works without it"
        )
    import io

    with img_mod.open(io.BytesIO(payload)) as im:
        return np.asarray(im.convert("L"), dtype=np.uint8)


def decode_image_status(
    payload: bytes, width: int, height: int
) -> tuple["np.ndarray", bool]:
    """(pixels, decode_ok): real Pillow decode when the codec exists
    (ok=True), deterministic fake otherwise (ok=False) — the fallback
    is EXPLICIT so downstream dedup can tell real pixels from
    synthesized ones instead of treating corrupt images as plausible
    decodes."""
    if _pillow() is not None:
        try:
            return decode_image(payload), True
        except NotImplementedError:  # pragma: no cover - race-safe
            pass
        except Exception:
            # corrupt payload under a real codec: fall through to the
            # deterministic fake rather than failing the task — but
            # FLAGGED, never silently
            pass
    return decode_image_fake(payload, width, height), False


def decode_image_auto(payload: bytes, width: int, height: int) -> "np.ndarray":
    """Real Pillow decode when the codec exists, deterministic fake
    otherwise — so the same pipeline code runs in both codec-less CI
    and a real cluster. Status-BLIND convenience wrapper: the fallback
    substitution is invisible to the caller, so :func:`resize_images`
    defaults to :func:`decode_image_status` instead (whose ``(array,
    ok)`` tuple survives any wrapping); use this one only where the
    flag genuinely doesn't matter."""
    return decode_image_status(payload, width, height)[0]


def byte_features(df: DataFrame, id_col: str, payload_col: str) -> DataFrame:
    """Deterministic byte-level features via Arrow-batched mapInPandas:
    (item_id, byte_len, md5 digest, mean byte value)."""

    def featurize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in batches:
            payloads = pdf[payload_col]
            yield pd.DataFrame(
                {
                    "item_id": pdf[id_col],
                    "byte_len": payloads.map(
                        lambda b: len(b) if b is not None else None
                    ).astype("Int64"),
                    "digest": payloads.map(
                        lambda b: hashlib.md5(b).hexdigest() if b is not None else None
                    ),
                    "mean_byte": payloads.map(
                        lambda b: (sum(b) / len(b)) if b else None
                    ),
                }
            )

    return df.select(id_col, payload_col).mapInPandas(featurize, FEATURE_SCHEMA)


def repartition_by_size(
    df: DataFrame, payload_col: str, target_partition_bytes: int = 64 << 20
) -> DataFrame:
    """Range-partition items by payload size so Arrow batches carry
    comparable byte volume (large media skews per-task memory
    otherwise). At scale, combine with maxRecordsPerBatch."""
    return df.withColumn("__sz", F.length(F.col(payload_col))).repartitionByRange(
        "__sz"
    ).drop("__sz")


def frame_sample_plan(
    df: DataFrame,
    id_col: str,
    meta_col: str,
    every_ms: int = 1000,
    max_frames: int = 10_000,
) -> DataFrame:
    """Explode a per-item frame-sampling plan from metadata only (no
    decode): one row per planned frame timestamp. The decode of each
    planned frame is the stubbed step.

    duration_ms is untrusted metadata: the count is computed in BIGINT
    (no int32 saturation) and clamped to ``max_frames`` so a corrupt
    duration cannot fan one row out into billions inside a single task
    (same hardening as :func:`extract_frames`)."""
    n_frames = (F.col(f"{meta_col}.duration_ms") / every_ms).cast("bigint")
    capped_last = F.least(
        F.greatest(n_frames - 1, F.lit(0)), F.lit(max_frames - 1)
    )
    return df.select(
        F.col(id_col),
        F.explode(
            F.transform(
                F.sequence(F.lit(0).cast("bigint"), capped_last),
                lambda i: (i * every_ms).cast("long"),
            )
        ).alias("frame_ts_ms"),
    )


MAGIC_SCHEMA = T.StructType(
    [
        T.StructField("item_id", T.LongType(), False),
        T.StructField("mime", T.StringType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
    ]
)


def _sniff_one(b: bytes | None) -> tuple[str | None, int | None, int | None]:
    """Container sniffing + dimension extraction from raw headers —
    pure byte arithmetic, no codec library:

    - PNG: IHDR width/height are big-endian u32 at offsets 16/20;
    - GIF: logical-screen size is little-endian u16 at offsets 6/8;
    - JPEG: scan markers for the first SOFn frame header;
    - BMP: little-endian i32 at offsets 18/22.
    """
    if not b or len(b) < 12:
        return None, None, None
    if b[:8] == b"\x89PNG\r\n\x1a\n" and len(b) >= 24:
        w = int.from_bytes(b[16:20], "big")
        h = int.from_bytes(b[20:24], "big")
        return "image/png", w, h
    if b[:6] in (b"GIF87a", b"GIF89a") and len(b) >= 10:
        w = int.from_bytes(b[6:8], "little")
        h = int.from_bytes(b[8:10], "little")
        return "image/gif", w, h
    if b[:2] == b"BM" and len(b) >= 26:
        w = int.from_bytes(b[18:22], "little", signed=True)
        h = int.from_bytes(b[22:26], "little", signed=True)
        return "image/bmp", w, abs(h)
    if b[:2] == b"\xff\xd8":  # JPEG SOI; walk segment markers
        i = 2
        while i + 1 < len(b):
            if b[i] != 0xFF:
                break
            # 0xFF fill bytes may pad between segments; the marker code
            # is the first non-0xFF byte after the run
            while i + 1 < len(b) and b[i + 1] == 0xFF:
                i += 1
            if i + 1 >= len(b):
                break
            marker = b[i + 1]
            if marker == 0x01 or 0xD0 <= marker <= 0xD9:
                # standalone markers (TEM, RSTn, SOI, EOI): no length word
                i += 2
                continue
            if i + 4 > len(b):
                break
            if (
                0xC0 <= marker <= 0xCF
                and marker not in (0xC4, 0xC8, 0xCC)
                and i + 9 <= len(b)
            ):
                h = int.from_bytes(b[i + 5 : i + 7], "big")
                w = int.from_bytes(b[i + 7 : i + 9], "big")
                return "image/jpeg", w, h
            seg_len = int.from_bytes(b[i + 2 : i + 4], "big")
            if seg_len < 2:  # malformed length word
                break
            i += 2 + seg_len
        return "image/jpeg", None, None
    return "application/octet-stream", None, None


def sniff_media_metadata(df: DataFrame, id_col: str, payload_col: str) -> DataFrame:
    """(item_id, mime, width, height) extracted from container headers
    via Arrow-batched mapInPandas — REAL metadata (not stubbed): header
    layouts are byte arithmetic, no codec needed. Pixel decode remains
    the stubbed step (:func:`decode_image`)."""

    def sniff(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = [(_sniff_one(b)) for b in pdf[payload_col]]
            yield pd.DataFrame(
                {
                    "item_id": pdf[id_col],
                    "mime": [o[0] for o in out],
                    "width": pd.array([o[1] for o in out], dtype="Int32"),
                    "height": pd.array([o[2] for o in out], dtype="Int32"),
                }
            )

    return df.select(id_col, payload_col).mapInPandas(sniff, MAGIC_SCHEMA)


def decode_image_fake(payload: bytes, width: int, height: int) -> "np.ndarray":
    """Deterministic FAKE decoder: tiles the payload bytes into a
    (height, width) uint8 grayscale array. Stands in for a real codec
    (none in this environment) so the resize/feature plumbing runs and
    is byte-for-byte reproducible; swap for PIL/torchvision decode on
    a real cluster (same signature: bytes → HxW array)."""
    buf = np.frombuffer(payload or b"\x00", dtype=np.uint8)
    need = width * height
    reps = -(-need // len(buf))
    return np.tile(buf, reps)[:need].reshape(height, width)


RESIZE_SCHEMA = T.StructType(
    [
        T.StructField("item_id", T.LongType(), False),
        T.StructField("width", T.IntegerType(), False),
        T.StructField("height", T.IntegerType(), False),
        T.StructField("pixels", T.BinaryType(), True),
        T.StructField("mean_px", T.DoubleType(), True),
        # True = the decoder produced real pixels; False = the
        # deterministic fallback was substituted (corrupt payload or
        # no codec library on the worker)
        T.StructField("decode_ok", T.BooleanType(), True),
    ]
)


def resize_images(
    df: DataFrame,
    id_col: str,
    payload_col: str,
    width: int = 32,
    height: int = 32,
    decoder=decode_image_status,
) -> DataFrame:
    """Decode + nearest-neighbor resize via Arrow-batched mapInPandas:
    (item_id, width, height, pixels, mean_px) with pixels a
    width×height uint8 buffer.

    The decoder is pluggable (default: :func:`decode_image_status` —
    real Pillow decode when the codec library exists on the worker,
    the deterministic fake otherwise, with the substitution FLAGGED);
    the Spark-side plumbing (schema, size-aware partitioning upstream,
    batch iteration, binary output column) is the real production
    shape either way. Resize is index-sampling (nearest neighbor) in
    pure numpy, so it needs no image library.

    ``decode_ok`` marks whether REAL pixels came back. The contract is
    value-based, not identity-based (so it survives lambdas/partials
    wrapping the decoder): a decoder that returns an ``(array, ok)``
    tuple — as the default does — passes its own flag through; a
    decoder that returns a bare array is trusted (True) by declaration.
    :func:`decode_image_auto` is status-BLIND — wrapping or passing it
    here reports decode_ok=True even on fallback; use
    :func:`decode_image_status` (or any tuple-returning wrapper of it)
    when the flag matters."""

    def work(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_rows = []
            for item_id, payload in zip(pdf[id_col], pdf[payload_col]):
                img = decoder(payload, 64, 64)  # native-ish res
                if isinstance(img, tuple):
                    img, ok = img
                else:
                    ok = True
                ys = (np.arange(height) * img.shape[0] // height)
                xs = (np.arange(width) * img.shape[1] // width)
                small = img[np.ix_(ys, xs)].astype(np.uint8)
                out_rows.append(
                    (
                        int(item_id),
                        width,
                        height,
                        small.tobytes(),
                        float(small.mean()),
                        bool(ok),
                    )
                )
            yield pd.DataFrame(
                out_rows,
                columns=[
                    "item_id",
                    "width",
                    "height",
                    "pixels",
                    "mean_px",
                    "decode_ok",
                ],
            )

    src = df.select(F.col(id_col), F.col(payload_col))
    return src.mapInPandas(work, RESIZE_SCHEMA)


FRAME_SCHEMA = T.StructType(
    [
        T.StructField("item_id", T.LongType(), False),
        T.StructField("frame_idx", T.LongType(), False),
        T.StructField("frame_ts_ms", T.LongType(), False),
        T.StructField("n_bytes", T.LongType(), True),
        T.StructField("byte_mean", T.DoubleType(), True),
        T.StructField("byte_crc", T.LongType(), True),
    ]
)


def default_frame_decoder(payload: bytes, frame_idx: int, window: int = 256):
    """Deterministic stand-in for a codec frame decode (no av libs in
    this environment): 'frame' = a byte window at a position derived
    from the frame index. Swap for a real codec via the ``decoder``
    arg of :func:`extract_frames`; the Spark-side plumbing (schema,
    batching, partitioning) is identical either way."""
    if not payload:
        return None
    start = (frame_idx * 9973) % max(len(payload) - window, 1)
    return payload[start : start + window]


def extract_frames(
    df: DataFrame,
    id_col: str,
    payload_col: str,
    meta_col: str,
    every_ms: int = 1000,
    decoder=default_frame_decoder,
    max_frames: int = 10_000,
) -> DataFrame:
    """Frame sampling over binary media: plan frames from metadata
    (``frame_sample_plan`` grain), decode each planned frame with the
    pluggable ``decoder``, emit per-frame feature rows.

    Scale shape: mapInPandas over Arrow batches — each task holds one
    batch of payloads plus its own frames, nothing is shuffled until
    the (much smaller) feature rows come out. Pair with
    ``repartition_by_size`` upstream so one giant video cannot skew a
    task; the decoder runs per (item, frame) and its output is reduced
    to features immediately (frames are never retained whole)."""
    import zlib

    # duration_ms is untrusted metadata: compute the plan in BIGINT
    # (no silent int32 overflow) and cap frames per item so corrupt
    # metadata cannot drive an unbounded Python loop in one task
    n_frames_col = (
        (F.col(f"{meta_col}.duration_ms") / every_ms).cast("bigint")
    )
    slim = df.select(
        F.col(id_col).alias("item_id"),
        F.col(payload_col).alias("__payload"),
        F.least(
            F.greatest(n_frames_col, F.lit(1)), F.lit(max_frames)
        ).alias("__nf"),
    )

    def work(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in (
                "item_id", "frame_idx", "frame_ts_ms",
                "n_bytes", "byte_mean", "byte_crc",
            )}
            for item_id, payload, nf in zip(
                pdf["item_id"], pdf["__payload"], pdf["__nf"]
            ):
                for i in range(int(nf)):
                    frame = decoder(payload, i)
                    out["item_id"].append(item_id)
                    out["frame_idx"].append(i)
                    out["frame_ts_ms"].append(i * every_ms)
                    if frame is None:
                        out["n_bytes"].append(None)
                        out["byte_mean"].append(None)
                        out["byte_crc"].append(None)
                    else:
                        arr = np.frombuffer(frame, dtype=np.uint8)
                        out["n_bytes"].append(len(frame))
                        out["byte_mean"].append(float(arr.mean()))
                        out["byte_crc"].append(zlib.crc32(frame))
            yield pd.DataFrame(out)

    return slim.mapInPandas(work, schema=FRAME_SCHEMA)


WAV_SCHEMA = T.StructType(
    [
        T.StructField("item_id", T.LongType(), False),
        T.StructField("is_wav", T.BooleanType(), False),
        T.StructField("n_channels", T.IntegerType(), True),
        T.StructField("sample_rate_hz", T.IntegerType(), True),
        T.StructField("bits_per_sample", T.IntegerType(), True),
        T.StructField("duration_ms", T.LongType(), True),
    ]
)


def _parse_wav_one(b: bytes | None):
    """RIFF/WAVE header walk (real parsing, no codec needed): fmt
    chunk → channels/rate/bits, data chunk size → duration."""
    import struct

    if not b or len(b) < 44 or b[0:4] != b"RIFF" or b[8:12] != b"WAVE":
        return (False, None, None, None, None)
    pos, n_ch, rate, bits, data_len = 12, None, None, None, None
    while pos + 8 <= len(b):
        cid = b[pos : pos + 4]
        (size,) = struct.unpack("<I", b[pos + 4 : pos + 8])
        if cid == b"fmt " and pos + 24 <= len(b):
            n_ch, rate = struct.unpack("<HI", b[pos + 10 : pos + 16])
            (bits,) = struct.unpack("<H", b[pos + 22 : pos + 24])
        elif cid == b"data":
            data_len = size
        pos += 8 + size + (size % 2)  # chunks are word-aligned
    dur = None
    if data_len is not None and rate and n_ch and bits:
        dur = int(data_len * 8000 // (rate * n_ch * bits))
    return (True, n_ch, rate, bits, dur)


def parse_wav_headers(df: DataFrame, id_col: str, payload_col: str) -> DataFrame:
    """Audio-modality metadata: parse WAV headers from the binary
    column (Arrow-batched, no shuffle — a narrow mapInPandas)."""

    def work(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = [_parse_wav_one(b) for b in pdf[payload_col]]
            yield pd.DataFrame(
                {
                    "item_id": pdf[id_col].values,
                    "is_wav": [r[0] for r in rows],
                    "n_channels": [r[1] for r in rows],
                    "sample_rate_hz": [r[2] for r in rows],
                    "bits_per_sample": [r[3] for r in rows],
                    "duration_ms": [r[4] for r in rows],
                }
            )

    return df.select(F.col(id_col), F.col(payload_col)).mapInPandas(
        work, schema=WAV_SCHEMA
    )


PHASH_SCHEMA = T.StructType(
    [
        T.StructField("item_id", T.LongType(), False),
        T.StructField("phash", T.LongType(), True),
    ]
)


def _area_mean_resize(img: "np.ndarray", out_h: int, out_w: int) -> "np.ndarray":
    """Deterministic area-mean downscale: rows/cols split into
    near-equal contiguous blocks, each output pixel the float mean of
    its block — no interpolation-library dependence, so the hash is
    bit-identical across environments."""
    h, w = img.shape
    if h % out_h == 0 and w % out_w == 0:
        # divisible dims: one vectorized reshape-mean (the common case
        # — fixed-size thumbnails), ~100× the looped fallback
        return (
            img.astype(np.float64)
            .reshape(out_h, h // out_h, out_w, w // out_w)
            .mean(axis=(1, 3))
        )
    rows = np.array_split(np.arange(h), out_h)
    cols = np.array_split(np.arange(w), out_w)
    out = np.empty((out_h, out_w), dtype=np.float64)
    for i, r in enumerate(rows):
        for j, c in enumerate(cols):
            out[i, j] = img[np.ix_(r, c)].mean()
    return out


def dhash64(
    df: DataFrame,
    id_col: str,
    payload_col: str,
    width_col: str,
    height_col: str,
    decoder=decode_image_fake,
) -> DataFrame:
    """64-bit difference-hash (dHash) perceptual fingerprint per image:
    decode → grayscale → area-mean resize to 9×8 → bit j set iff
    pixel[r, c] > pixel[r, c+1] (row-major over the 8×8 gradient
    grid). Robust to re-encoding/scaling (gradient signs survive),
    which is what makes Hamming-near fingerprints an image NEAR-dup
    signal rather than an exact-byte one.

    Arrow-batched mapInPandas (the sanctioned Python hot path — codec
    work is not SQL-expressible); the decoder seam takes
    (payload, width, height) like :func:`decode_image_fake`, and — as
    in :func:`resize_images` — a decoder returning an ``(array, ok)``
    tuple (e.g. :func:`decode_image_status`, or any wrapper of it) has
    its array unwrapped, so the same decoder object works in both
    operators; dHash carries no decode_ok column, so the status half
    is simply dropped here. Pairing happens downstream via the
    shared banded Hamming join
    (aws_etl_spark.dedup.simhash.hamming_near_dup_pairs) — same
    pigeonhole candidate generation as SimHash text dedup, so image
    dedup inherits the linear-scale path."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            hashes = []
            for b, w, h in zip(
                pdf[payload_col], pdf[width_col], pdf[height_col]
            ):
                if b is None:
                    hashes.append(None)
                    continue
                img = decoder(bytes(b), int(w), int(h))
                if isinstance(img, tuple):  # (array, decode_ok) seam
                    img = img[0]
                small = _area_mean_resize(img, 8, 9)
                bits = (small[:, :-1] > small[:, 1:]).astype(np.uint64).ravel()
                sig = 0
                for j, bit in enumerate(bits):
                    sig |= int(bit) << j
                # two's-complement into a signed 64-bit long (bit 63 =
                # sign) — same convention as xxhash64/simhash columns
                hashes.append(sig - (1 << 64) if sig >= (1 << 63) else sig)
            yield pd.DataFrame(
                {"item_id": pdf[id_col], "phash": pd.array(hashes, dtype="Int64")}
            )

    return df.select(id_col, payload_col, width_col, height_col).mapInPandas(
        kernel, PHASH_SCHEMA
    )


def decode_render_fake(payload: bytes, width: int, height: int) -> "np.ndarray":
    """Deterministic stand-in decode for PERCEPTUAL-hash demos: render
    the payload's word-3-gram shingle set onto a (height, width) grid
    (md5-hashed bucket per shingle, brightness = count, max-scaled).

    Rationale: :func:`decode_image_fake` tiles raw bytes, so a single
    inserted byte SHIFTS the whole image — the opposite of how real
    image near-dups behave (spatially stable, a few local changes).
    This renderer is shift-invariant by construction (set semantics),
    giving the corpus's text payloads image-like near-dup geometry:
    measured on the sf0.01 stand-in corpus, true near-dup pairs land
    at dHash Hamming 0–2 while the 0.1th percentile of random pairs
    is ≥10 — the separation a real codec + dHash gives on re-encoded
    images. Swap for a real decoder via the same (payload, width,
    height) seam."""
    import zlib

    words = bytes(payload or b"").decode("utf-8", "ignore").split()
    n = width * height
    img = np.zeros(n, dtype=np.int64)
    for i in range(len(words) - 2):
        # crc32: deterministic, C-speed; bucket-uniform enough for a
        # few hundred cells (this is a renderer, not a cryptographic
        # fingerprint)
        h = zlib.crc32(" ".join(words[i : i + 3]).encode())
        img[h % n] += 1
    m = img.max() or 1
    return (img * 255 // m).astype(np.uint8).reshape(height, width)


def decode_render_md5(payload: bytes, width: int, height: int) -> "np.ndarray":
    """:func:`decode_render_fake` with the cell hash switched from
    crc32 to the first 8 hex digits of md5 — the one change that makes
    the whole render SQL-expressible on BOTH engines (DuckDB has no
    crc32 spelling; md5-hex decoding is the repo's established
    portable coin, ops/corpus.py:43). Exists so the perceptual-hash
    pipeline (render → area-mean 9×8 → gradient sign → banded Hamming
    join) gets a driver-hash-provable exact twin
    (``multimodal_phash_neardup_exact``); same shift-invariant
    shingle-set geometry as the crc32 renderer."""
    import hashlib

    words = bytes(payload or b"").decode("utf-8", "ignore").split()
    n = width * height
    img = np.zeros(n, dtype=np.int64)
    for i in range(len(words) - 2):
        h = int(
            hashlib.md5(" ".join(words[i : i + 3]).encode()).hexdigest()[:8],
            16,
        )
        img[h % n] += 1
    m = img.max() or 1
    return (img * 255 // m).astype(np.uint8).reshape(height, width)
