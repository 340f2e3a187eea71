"""Multimodal binary columns: schema + Spark-side plumbing + real decode for
codec-free formats.

Image/audio/video payloads are opaque ``binary`` columns with typed metadata
(the Iceberg/parquet-native representation at 100TB: bytes stay columnar and
compressed, metadata prunes without touching them). The decode/resize/
frame-sample kernels run as Arrow-batched ``mapInPandas`` so the bytes cross
into Python exactly once per batch.

Decode support, in order of preference:

* **BMP** (BITMAPINFOHEADER, uncompressed 8/24/32-bit) and **PPM (P6)**
  images, **AU01** audio (s16 PCM) and **VI01** video (BMP frame sequence)
  are decoded for real, from scratch in NumPy -- header-described
  uncompressed formats need no codec library, so decode / feature-extract /
  resize / frame-sample all run genuinely end-to-end.
* Compressed formats (JPEG/PNG/MP3/H.264) would need PIL/ffmpeg, which are
  not installed in this environment: those payloads raise unless
  ``fake=True``, in which case a clearly-marked deterministic fake derives
  "pixels" from the byte content. Swapping in a real codec is a one-function
  change; every surrounding Spark surface (schema, partitioning, UDF
  signature, batch shape, error rows) is identical either way.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "media_id long, kind string, payload binary, "
    "meta struct<mime:string, width:int, height:int, duration_ms:int>"
)

FEATURE_SCHEMA = (
    "media_id long, kind string, feat array<double>, feat_dim int, "
    "decode_ok boolean"
)

_FEAT_DIM = 16


# ---------------------------------------------------------------------------
# real decoders (header-described uncompressed formats; pure NumPy)
# ---------------------------------------------------------------------------

def decode_bmp(data: bytes) -> np.ndarray:
    """BMP -> (H, W) grayscale float64. Supports BITMAPINFOHEADER (or later)
    uncompressed 8-bit (palette/grayscale), 24-bit BGR and 32-bit BGRA,
    bottom-up or top-down. Raises ValueError on anything else."""
    b = np.frombuffer(data, dtype=np.uint8)
    if len(b) < 54 or bytes(b[:2]) != b"BM":
        raise ValueError("not a BMP")

    def u32(o):
        return int(b[o]) | int(b[o + 1]) << 8 | int(b[o + 2]) << 16 | int(b[o + 3]) << 24

    def u16(o):
        return int(b[o]) | int(b[o + 1]) << 8

    data_off = u32(10)
    hdr_size = u32(14)
    if hdr_size < 40:
        raise ValueError("unsupported BMP header")
    w = np.int32(u32(18)).item()
    h_raw = np.int32(u32(22)).item()
    bottom_up = h_raw > 0
    h = abs(h_raw)
    bits = u16(28)
    compression = u32(30)
    if compression != 0 or bits not in (8, 24, 32) or w <= 0 or h == 0:
        raise ValueError("unsupported BMP variant")
    row_bytes = (w * bits // 8 + 3) & ~3
    end = data_off + row_bytes * h
    if end > len(b):
        raise ValueError("truncated BMP")
    rows = b[data_off:end].reshape(h, row_bytes)
    if bits == 8:
        px = rows[:, :w].astype(np.float64)
    else:
        nch = bits // 8
        rgbx = rows[:, : w * nch].reshape(h, w, nch).astype(np.float64)
        # BGR(A) -> luma (Rec.601), rounded half-up to integer gray levels
        px = np.floor(0.114 * rgbx[:, :, 0] + 0.587 * rgbx[:, :, 1]
                      + 0.299 * rgbx[:, :, 2] + 0.5)
    return px[::-1] if bottom_up else px


def decode_ppm(data: bytes) -> np.ndarray:
    """PPM (P6, binary) -> (H, W) grayscale float64 (Rec.601 luma)."""
    if data[:2] != b"P6":
        raise ValueError("not a P6 PPM")
    # header: magic, width, height, maxval -- whitespace/comment separated
    pos, fields = 2, []
    while len(fields) < 3:
        while pos < len(data) and data[pos : pos + 1].isspace():
            pos += 1
        if pos < len(data) and data[pos : pos + 1] == b"#":
            while pos < len(data) and data[pos : pos + 1] != b"\n":
                pos += 1
            continue
        start = pos
        while pos < len(data) and not data[pos : pos + 1].isspace():
            pos += 1
        if pos == start:
            raise ValueError("truncated PPM header")
        fields.append(int(data[start:pos]))
    pos += 1  # single whitespace after maxval
    w, h, maxval = fields
    if maxval > 255:
        raise ValueError("16-bit PPM unsupported")
    need = w * h * 3
    raw = np.frombuffer(data, dtype=np.uint8, count=need, offset=pos)
    rgb = raw.reshape(h, w, 3).astype(np.float64)
    return np.floor(0.299 * rgb[:, :, 0] + 0.587 * rgb[:, :, 1]
                    + 0.114 * rgb[:, :, 2] + 0.5)


def encode_bmp(gray: np.ndarray) -> bytes:
    """(H, W) uint8 -> 24-bit bottom-up BMP (test fixture encoder)."""
    g = np.asarray(gray, dtype=np.uint8)
    h, w = g.shape
    row_bytes = (w * 3 + 3) & ~3
    img = np.zeros((h, row_bytes), dtype=np.uint8)
    px = np.repeat(g[::-1, :, None], 3, axis=2).reshape(h, w * 3)
    img[:, : w * 3] = px
    body = img.tobytes()
    import struct
    header = struct.pack("<2sIHHI", b"BM", 54 + len(body), 0, 0, 54)
    dib = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(body),
                      2835, 2835, 0, 0)
    return header + dib + body


def resize_gray(img: np.ndarray, h: int, w: int) -> np.ndarray:
    """Nearest-neighbor resize of a grayscale array (the resize kernel of
    the multimodal pipeline; pure NumPy index arithmetic)."""
    src = np.asarray(img, dtype=np.float64)
    sh, sw = src.shape
    ri = np.minimum((np.arange(h) * sh) // h, sh - 1)
    ci = np.minimum((np.arange(w) * sw) // w, sw - 1)
    return src[ri][:, ci]


def decode_audio(data: bytes) -> np.ndarray:
    """AU01 container (u32 n_samples + s16le PCM) -> samples mapped onto the
    0..255 grayscale range so the shared histogram featurizer applies."""
    if data[:4] != b"AU01":
        raise ValueError("not an AU01 payload")
    import struct as _s
    if len(data) < 8:
        raise ValueError("truncated AU01 header")
    (n,) = _s.unpack_from("<I", data, 4)
    if len(data) < 8 + 2 * n:
        raise ValueError("truncated AU01 body")
    samples = np.frombuffer(data, dtype="<i2", count=n, offset=8)
    return (samples.astype(np.float64) + 32768.0) / 256.0


def encode_audio(samples: np.ndarray) -> bytes:
    import struct as _s
    s = np.asarray(samples, dtype="<i2")
    return b"AU01" + _s.pack("<I", len(s)) + s.tobytes()


def decode_video_frames(data: bytes) -> list[bytes]:
    """VI01 container (u32 n_frames + per-frame u32 length + BMP bytes) ->
    raw frame payloads."""
    if data[:4] != b"VI01":
        raise ValueError("not a VI01 payload")
    import struct as _s
    if len(data) < 8:
        raise ValueError("truncated VI01 header")
    (n,) = _s.unpack_from("<I", data, 4)
    off = 8
    frames = []
    for _ in range(n):
        if off + 4 > len(data):
            raise ValueError("truncated VI01 frame header")
        (ln,) = _s.unpack_from("<I", data, off)
        off += 4
        if off + ln > len(data):
            raise ValueError("truncated VI01 frame body")
        frames.append(data[off : off + ln])
        off += ln
    return frames


def encode_video(frames: list[bytes]) -> bytes:
    import struct as _s
    out = b"VI01" + _s.pack("<I", len(frames))
    for f in frames:
        out += _s.pack("<I", len(f)) + f
    return out


def frame_sample(data: bytes, k: int) -> list[np.ndarray]:
    """k evenly spaced decoded frames of a VI01 video (the frame-sample
    kernel), each resized to 8x8."""
    frames = decode_video_frames(data)
    if not frames:
        return []
    idx = np.unique((np.arange(k) * len(frames)) // max(k, 1))
    return [resize_gray(decode_bmp(frames[i]), 8, 8) for i in idx]


def decode_media(payload: bytes, meta, fake: bool = False) -> np.ndarray:
    """Any supported payload -> grayscale-range array for the featurizer:
    BMP/PPM images, AU01 audio, VI01 video (mean of 4 sampled frames)."""
    b = bytes(payload)
    if b[:4] == b"AU01":
        return decode_audio(b)
    if b[:4] == b"VI01":
        frames = frame_sample(b, 4)
        if not frames:
            raise ValueError("empty video")
        return np.mean(frames, axis=0)
    return decode_image(b, meta, fake=fake)


def decode_image(payload: bytes, meta, fake: bool = False) -> np.ndarray:
    """Decode payload -> (H, W) grayscale array.

    BMP and PPM decode for real (no codec library needed); other formats
    raise unless ``fake=True`` (deterministic byte-tiling fake)."""
    b = bytes(payload)
    if b[:2] == b"BM":
        return decode_bmp(b)
    if b[:2] == b"P6":
        return decode_ppm(b)
    if not fake:
        raise NotImplementedError(
            "compressed-format decoding requires a codec library "
            "(PIL/turbojpeg/ffmpeg) not available in this environment; "
            "BMP and PPM decode natively, or pass fake=True for the "
            "deterministic test fake")
    # deterministic fake: tile the payload bytes into the declared shape
    w = int(meta["width"] or 8)
    h = int(meta["height"] or 8)
    raw = np.frombuffer(b, dtype=np.uint8)
    if len(raw) == 0:
        raw = np.zeros(1, dtype=np.uint8)
    return np.resize(raw, (h, w)).astype(np.float64)


def extract_features(df: DataFrame, fake_decode: bool = False) -> DataFrame:
    """media table -> per-item feature vector (histogram of the decoded
    pixels, _FEAT_DIM bins). Bad/undecodable rows yield decode_ok=false and
    a null feature instead of failing the job."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats, oks = [], []
            for payload, meta in zip(pdf["payload"], pdf["meta"]):
                try:
                    img = decode_media(payload, meta, fake=fake_decode)
                    hist, _ = np.histogram(img, bins=_FEAT_DIM, range=(0, 256))
                    total = hist.sum() or 1
                    feats.append((hist / total).tolist())
                    oks.append(True)
                except Exception:
                    feats.append(None)
                    oks.append(False)
            yield pd.DataFrame({
                "media_id": pdf["media_id"],
                "kind": pdf["kind"],
                "feat": feats,
                "feat_dim": np.full(len(pdf), _FEAT_DIM, dtype=np.int32),
                "decode_ok": oks,
            })

    return df.mapInPandas(run, FEATURE_SCHEMA)


def _synth_media_draws(n: int, seed: int = 42):
    """The seeded ground-truth arrays behind synth_media, BEFORE encoding:
    (i, kind, array) with image -> (16,16) uint8 gray, audio -> s16 samples,
    video -> list of (12,12) uint8 gray frames. Shared by the table builder
    and the driver-oracle renderer so the oracle's inlined literals are the
    pre-encode ground truth (never the engine decoders' output)."""
    rng = np.random.default_rng(seed)
    kinds = ["image", "audio", "video"]
    for i in range(n):
        k = kinds[i % 3]
        if k == "image":
            yield i, k, rng.integers(0, 256, (16, 16), dtype=np.uint8)
        elif k == "audio":
            n_samp = int(rng.integers(200, 800))
            yield i, k, rng.integers(-32768, 32768, n_samp).astype("<i2")
        else:
            n_frames = 3 + i % 4
            yield i, k, [rng.integers(0, 256, (12, 12), dtype=np.uint8)
                         for _ in range(n_frames)]


def synth_media(spark: SparkSession, n: int, seed: int = 42) -> DataFrame:
    """Deterministic fake media table exercising the schema + batch path.

    every kind carries a REAL decodable payload (no codec library needed):
    image = 16x16 24-bit BMP; audio = AU01 s16 PCM; video = VI01 sequence of
    (3 + i % 4) BMP frames. The full decode / feature-extract / resize /
    frame-sample pipeline therefore runs genuinely end-to-end."""
    rows = []
    mimes = {"image": "image/bmp", "audio": "audio/x-au01",
             "video": "video/x-vi01"}
    for i, k, arr in _synth_media_draws(n, seed):
        if k == "image":
            payload = encode_bmp(arr)
        elif k == "audio":
            payload = encode_audio(arr)
        else:
            payload = encode_video([encode_bmp(f) for f in arr])
        rows.append((i, k, payload,
                     {"mime": mimes[k], "width": 16, "height": 16,
                      "duration_ms": 1000 if k != "image" else None}))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def media_features_oracle_sql(n: int, seed: int = 42) -> str:
    """Ground-truth DuckDB replay of extract_features over synth_media:
    verifies the feature VALUES, not just the contract (VERDICT r2 task #4).

    The seeded pre-encode pixel/sample arrays are inlined as INTEGER
    literals -- they never pass through the engine's decoders, so the oracle
    checks encode -> decode -> featurize end to end -- and the histogram
    featurizer is replayed in pure SQL arithmetic for ALL THREE kinds.

    Every decoded value is an exact integer ratio iv/divisor:
    * image: gray pixels themselves (24-bit BMP luma round-trips exactly:
      floor(.114g+.587g+.299g+.5) == g, error is ulp-scale vs the 0.5
      margin), divisor 1;
    * audio: (sample+32768)/256 -- divisor a power of two, exact;
    * video: frame_sample picks indices (arange(4)*n)//4 uniq'd, resize_gray
      selects integer pixels (index arithmetic only), np.mean sums <= 6
      small ints (exact in float64) then divides by k -- so iv = the integer
      pixel SUM across sampled frames, divisor k.
    Binning floor(v/16) is a power-of-two divide (no rounding; equals
    np.histogram's x*(16/256) fast path bit-for-bit) and p = cnt/total is a
    single correctly-rounded IEEE division of small ints -- every value is
    reproducible bit-exact per the float-parity policy."""
    rows = []
    for i, k, arr in _synth_media_draws(n, seed):
        if k == "image":
            ivals = arr.astype(np.int64).ravel().tolist()
            div = 1
        elif k == "audio":
            ivals = (arr.astype(np.int64) + 32768).tolist()
            div = 256
        else:
            idx = np.unique((np.arange(4) * len(arr)) // 4)
            ri = np.minimum((np.arange(8) * 12) // 8, 11)
            sel = [arr[j].astype(np.int64)[ri][:, ri] for j in idx]
            ivals = np.sum(sel, axis=0).ravel().tolist()
            div = len(sel)
        rows.append(f"({i}, '{k}', {div}, "
                    f"[{','.join(map(str, ivals))}])")
    values = ",\n".join(rows)
    return f"""
WITH __m(media_id, kind, divisor, ivals) AS (VALUES
{values}
),
__v AS (
  SELECT media_id, CAST(unnest(ivals) AS DOUBLE) / CAST(divisor AS DOUBLE) AS v
  FROM __m
),
__h AS (
  SELECT media_id, LEAST(CAST(FLOOR(v / 16.0) AS INT), 15) AS bin,
         COUNT(*) AS cnt
  FROM __v GROUP BY media_id, bin
),
__t AS (SELECT media_id, COUNT(*) AS total FROM __v GROUP BY media_id),
__full AS (
  SELECT m.media_id, m.kind, b.bin, COALESCE(h.cnt, 0) AS cnt, t.total
  FROM __m m
  CROSS JOIN (SELECT unnest(generate_series(0, 15)) AS bin) b
  LEFT JOIN __h h ON h.media_id = m.media_id AND h.bin = b.bin
  JOIN __t t ON t.media_id = m.media_id
)
SELECT media_id, kind, CAST(bin AS INT) AS bin,
       CAST(cnt AS DOUBLE) / total AS p, TRUE AS decode_ok
FROM __full"""


# ---------------------------------------------------------------------------
# perceptual image hash (aHash) -- multimodal dedup
# ---------------------------------------------------------------------------

AHASH_SCHEMA = "media_id long, ahash_hi long, ahash_lo long, decode_ok boolean"


def ahash_limbs(img: np.ndarray) -> tuple[int, int]:
    """64-bit average hash of a grayscale image as two 32-bit limbs:
    nearest-neighbor 8x8 downsample (resize_gray: pure integer index
    selection), mean threshold, row-major bits. Every arithmetic step is
    exact: the 64 selected pixels are integer-valued, their sum and the
    /64 power-of-two divide are exact in float64 (order-independent), and
    the bit weights are exact uint64 -- so the hash is bit-reproducible
    and SQL-replayable. Limbs (not one int64) keep bit 63 out of the
    signed-overflow zone (the dedup.py HUGEINT lesson, solved cheaper)."""
    small = resize_gray(img, 8, 8).ravel()
    mean = small.sum() / 64.0
    bits = small > mean
    w = (1 << np.arange(32, dtype=np.uint64))
    hi = int((bits[:32] * w).sum(dtype=np.uint64))
    lo = int((bits[32:] * w).sum(dtype=np.uint64))
    return hi, lo


def image_ahash(df: DataFrame, fake_decode: bool = False) -> DataFrame:
    """media table -> (media_id, ahash_hi, ahash_lo, decode_ok): the
    perceptual-dedup key for image payloads (exact copies AND nearest-
    neighbor rescales map to the identical hash, because the 8x8 grid
    selects the same source pixels -- pinned in tests). Bytes cross Arrow
    once per batch; undecodable rows get nulls, not failures."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            his, los, oks = [], [], []
            for payload, meta in zip(pdf["payload"], pdf["meta"]):
                try:
                    img = decode_image(bytes(payload), meta, fake=fake_decode)
                    hi, lo = ahash_limbs(img)
                    his.append(hi)
                    los.append(lo)
                    oks.append(True)
                except Exception:
                    his.append(None)
                    los.append(None)
                    oks.append(False)
            yield pd.DataFrame({
                "media_id": pdf["media_id"],
                "ahash_hi": pd.array(his, dtype="Int64"),
                "ahash_lo": pd.array(los, dtype="Int64"),
                "decode_ok": oks,
            })

    return df.mapInPandas(run, AHASH_SCHEMA)


def synth_images_with_dups(spark: SparkSession, n: int,
                           seed: int = 42) -> DataFrame:
    """Image rows of synth_media plus planted duplicates: an exact
    re-encoded copy (id+10000) for every other image and a 32x32
    nearest-neighbor UPSCALE (id+20000) for every third -- the upscale
    selects the identical 8x8 source pixels, so its aHash provably equals
    the original's (scale invariance, the property that makes aHash a
    dedup key for re-hosted thumbnails)."""
    rows = []
    for i, k, arr in _synth_media_draws(n, seed):
        if k != "image":
            continue
        meta = {"mime": "image/bmp", "width": 16, "height": 16,
                "duration_ms": None}
        rows.append((i, "image", encode_bmp(arr), meta))
        if i % 2 == 0:
            rows.append((i + 10000, "image", encode_bmp(arr), meta))
        if i % 3 == 0:
            up = np.repeat(np.repeat(arr, 2, axis=0), 2, axis=1)
            meta32 = dict(meta, width=32, height=32)
            rows.append((i + 20000, "image", encode_bmp(up), meta32))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def ahash_oracle_sql(n: int, seed: int = 42) -> str:
    """Ground-truth replay of image_ahash over synth_images_with_dups:
    the 64 SELECTED pre-encode pixels per row are inlined (selection is
    pure integer index arithmetic done here in the generator; the values
    never pass through the engine decoders), then mean/threshold/limb
    arithmetic is replayed in SQL -- verifying hash VALUES end to end
    through encode_bmp -> decode_bmp -> resize -> threshold."""
    sel8 = (np.arange(8) * 16) // 8            # rows/cols picked from 16x16
    # (the 32x32 upscale's selection (arange(8)*32)//8, mapped back through
    # the repeat, lands on exactly these same source cells)
    rows = []
    for i, k, arr in _synth_media_draws(n, seed):
        if k != "image":
            continue
        picked = arr.astype(np.int64)[sel8][:, sel8].ravel().tolist()
        lits = "[" + ",".join(map(str, picked)) + "]"
        rows.append(f"({i}, {lits})")
        if i % 2 == 0:
            rows.append(f"({i + 10000}, {lits})")
        if i % 3 == 0:
            # upscale selection resolves to the same source pixels
            rows.append(f"({i + 20000}, {lits})")
    values = ",\n".join(rows)
    return f"""
WITH __m(media_id, px) AS (VALUES
{values}
),
__v AS (
  SELECT media_id, t.k, px[t.k + 1] AS v,
         CAST(list_sum(px) AS DOUBLE) / 64.0 AS mean
  FROM __m, (SELECT unnest(range(64)) AS k) t
),
__h AS (
  SELECT media_id,
         CAST(COALESCE(SUM(CASE WHEN v > mean AND k < 32
                                THEN (1::BIGINT << k) END), 0) AS BIGINT)
           AS ahash_hi,
         CAST(COALESCE(SUM(CASE WHEN v > mean AND k >= 32
                                THEN (1::BIGINT << (k - 32)) END), 0)
              AS BIGINT) AS ahash_lo
  FROM __v GROUP BY media_id
)
SELECT media_id, ahash_hi, ahash_lo, TRUE AS decode_ok,
       COUNT(*) OVER (PARTITION BY ahash_hi, ahash_lo) AS n_same_hash
FROM __h"""
