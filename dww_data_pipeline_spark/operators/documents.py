"""Document assembly, sinks, and multimodal column plumbing.

* nested JSON / CSV sinks (reference S6-S10, dwwApi.js:14-224,
  utils/jsonToCsv.py:17-34)
* KML track formatter (reference S9, pathCreator.js:75-133) —
  presentation-layer string assembly via format_string.
* multimodal binary columns (north-star): schema + mapInPandas
  plumbing is real and tested; the actual media decode is stubbed
  (image/audio libs are not in this container) behind a deterministic
  fake, clearly marked.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from dww_data_pipeline_spark.functions.strings import strip_commas


# ------------------------------------------------------------- sinks

def to_flat_csv(df: DataFrame, cols: list[str], path: str | None = None):
    """S6: flat CSV export with the reference's comma-strip escaping
    (commas removed from string values instead of quoted,
    dwwApi.js:33-35)."""
    out = df.select(
        *[
            strip_commas(F.col(c)).alias(c) if dict(df.dtypes)[c] == "string" else F.col(c)
            for c in cols
        ]
    )
    if path is not None:
        out.write.mode("overwrite").option("header", True).csv(path)
    return out


def to_nested_json(
    df: DataFrame,
    entity_cols: list[str],
    rel_cols: list[str],
    order_cols: list[str],
    path: str | None = None,
):
    """S8: nested per-entity JSON documents
    ``{<entity cols>, rels: [...]}`` (reference dwwApi.js:216-224)."""
    from dww_data_pipeline_spark.operators.sequence import nest_documents

    nested = nest_documents(df, entity_cols, rel_cols, order_cols)
    if path is not None:
        nested.write.mode("overwrite").json(path)
    return nested


def kml_tracks(
    jumps: DataFrame,
    name_col: str,
    coords_col: str,
    when_col: str,
) -> DataFrame:
    """S9: gx:Track placemark KML string per jump arc (reference
    pathCreator.js:101-133). Pure string assembly — presentation
    layer, excluded from the correctness surface like the reference's
    random-altitude arcs (pathCreator.js:113-124)."""
    return jumps.select(
        F.format_string(
            '<Placemark><name>%s</name><gx:Track><when>%s</when>'
            "<gx:coord>%s</gx:coord></gx:Track></Placemark>",
            F.col(name_col),
            F.col(when_col),
            F.col(coords_col),
        ).alias("kml")
    )


# ------------------------------------------------- multimodal columns

# Typed metadata travels beside the opaque payload so partition
# pruning / filtering never touches the bytes.
MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image|audio|video
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("mime", T.StringType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("duration_ms", T.LongType(), True),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("feature", T.ArrayType(T.FloatType()), True),
        T.StructField("decode_ok", T.BooleanType(), False),
    ]
)


def _fake_decode(payload: bytes | None, dim: int = 8) -> list[float]:
    """FALLBACK: deterministic hash 'decode + feature extract' for
    payloads in formats the real codec does not cover (media codecs
    beyond PPM/BMP are not in this container). Hashes payload bytes
    into a fixed-dim feature so the Spark plumbing (Arrow batches,
    schema, partitioning) stays exercised and deterministic for any
    payload.
    """
    if payload is None:
        raise NotImplementedError("media decode requires payload bytes")
    out = []
    h = 2166136261
    for i in range(dim):
        for b in payload[i::dim] or b"\x00":
            h = (h ^ b) * 16777619 & 0xFFFFFFFF
        out.append((h % 10_000) / 10_000.0)
    return out


def _decode_features(payload: bytes | None, dim: int = 8) -> list[float]:
    """REAL decode first (pure-NumPy PPM/BMP codec — media_codec.py),
    hash fallback for unknown formats; raises for NULL payloads."""
    from dww_data_pipeline_spark.operators.media_codec import (
        decode_image,
        image_features,
    )

    if payload is None:
        raise NotImplementedError("media decode requires payload bytes")
    arr = decode_image(payload)
    if arr is not None:
        return image_features(arr, dim)
    return _fake_decode(payload, dim)


RESIZED_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("decode_ok", T.BooleanType(), False),
    ]
)

FRAME_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("frame_index", T.IntegerType(), False),
        T.StructField("frame_ts_ms", T.LongType(), False),
        T.StructField("payload", T.BinaryType(), True),
    ]
)


def resize_media(media: DataFrame, width: int = 224, height: int = 224) -> DataFrame:
    """Image resize over binary payloads via mapInPandas.

    REAL path: PPM/BMP payloads are decoded (pure-NumPy codec,
    media_codec.py), nearest-neighbor resized, and re-encoded as
    binary PPM — actual pixels in, actual pixels out. Unknown formats
    take a deterministic byte-stride fallback (decode_ok=False) so the
    batch never dies on one bad payload.
    """
    from dww_data_pipeline_spark.operators.media_codec import (
        decode_image,
        encode_ppm,
        resize_nearest,
    )

    def _resize_one(payload: bytes | None) -> tuple[bytes | None, bool]:
        if payload is None:
            return None, False
        arr = decode_image(payload)
        if arr is not None:
            return encode_ppm(resize_nearest(arr, width, height)), True
        target = max(1, width * height // 64)
        stride = max(1, len(payload) // target)
        return payload[::stride][:target], False

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out, oks = [], []
            for payload in pdf["payload"]:
                p, ok = _resize_one(payload)
                out.append(p)
                oks.append(ok)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "payload": out,
                    "width": width,
                    "height": height,
                    "decode_ok": oks,
                }
            )

    return media.mapInPandas(batches, schema=RESIZED_SCHEMA)


def sample_frames(
    media: DataFrame, every_ms: int = 1000, max_frames: int = 8
) -> DataFrame:
    """Video frame sampling: one output row per sampled frame
    (media_id, frame_index, frame_ts_ms, payload) via mapInPandas —
    a Python-side flatMap whose fan-out is bounded by max_frames.

    REAL path: a concatenated-PPM stream (the rawvideo/image2pipe
    shape) splits into self-delimiting frames by sequential parsing —
    real pixel frames out. Other formats fall back to deterministic
    byte slices; duration comes from the metadata column
    (duration_ms), the real contract for pre-extracted media tables.
    """
    from dww_data_pipeline_spark.operators.media_codec import split_video_frames

    def _frames_of(payload: bytes) -> list[bytes]:
        try:
            return split_video_frames(payload, max_frames=max_frames)
        except ValueError:
            n = min(max_frames, max(1, len(payload) // 16))
            return [
                payload[(i * len(payload)) // max(n, 1) :][:16] for i in range(n)
            ]

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = {k: [] for k in ("media_id", "frame_index", "frame_ts_ms", "payload")}
            for mid, payload, dur in zip(
                pdf["media_id"], pdf["payload"], pdf["duration_ms"]
            ):
                if payload is None or dur is None:
                    continue
                frames = _frames_of(payload)
                n = min(len(frames), min(max_frames, max(1, int(dur) // every_ms)))
                for i in range(n):
                    rows["media_id"].append(mid)
                    rows["frame_index"].append(i)
                    rows["frame_ts_ms"].append(i * every_ms)
                    rows["payload"].append(frames[i])
            yield pd.DataFrame(rows)

    return media.mapInPandas(batches, schema=FRAME_SCHEMA)


def extract_media_features(media: DataFrame, dim: int = 8) -> DataFrame:
    """Decode + feature-extract over binary media columns via
    mapInPandas (Arrow-batched; batch shape preserved). PPM/BMP
    payloads get REAL pixel decode (media_codec.py: channel means/stds
    + luma histogram); unknown formats get the deterministic hash
    fallback — either way the distributed plumbing is identical."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            feats, oks = [], []
            for payload in pdf["payload"]:
                try:
                    feats.append(_decode_features(payload, dim))
                    oks.append(True)
                except NotImplementedError:
                    feats.append(None)
                    oks.append(False)
            yield pd.DataFrame(
                {"media_id": pdf["media_id"], "feature": feats, "decode_ok": oks}
            )

    return media.mapInPandas(batches, schema=FEATURE_SCHEMA)


AUDIO_FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("decode_ok", T.BooleanType(), False),
        T.StructField("sample_rate", T.IntegerType(), True),
        T.StructField("n_samples", T.IntegerType(), True),
        T.StructField("n_windows", T.IntegerType(), True),
        T.StructField("rms0", T.DoubleType(), True),
        T.StructField("zcr0", T.DoubleType(), True),
    ]
)


def extract_audio_features(media: DataFrame, window: int = 8) -> DataFrame:
    """Decode + featurize binary AUDIO columns via mapInPandas: A16
    waveforms (media_codec.decode_audio) reduced to per-window RMS +
    zero-crossing-rate, surfacing the first window's values plus
    stream metadata. Malformed payloads yield decode_ok=False rows
    (never a raised batch) — the audio twin of
    :func:`extract_media_features`, same batch shape and fallback
    contract."""
    from dww_data_pipeline_spark.operators.media_codec import (
        audio_features,
        decode_audio,
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = (
            "media_id",
            "decode_ok",
            "sample_rate",
            "n_samples",
            "n_windows",
            "rms0",
            "zcr0",
        )
        for pdf in it:
            rows: dict[str, list] = {k: [] for k in cols}
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                rate = n = nw = None
                rms0 = zcr0 = None
                ok = False
                try:
                    decoded = decode_audio(payload)
                    if decoded is not None:
                        rate, samples = decoded
                        n = len(samples)
                        wins = audio_features(samples, window=window)
                        nw = len(wins)
                        if wins:
                            rms0, zcr0 = wins[0]
                        ok = True
                except ValueError:
                    pass
                rows["media_id"].append(mid)
                rows["decode_ok"].append(ok)
                rows["sample_rate"].append(rate)
                rows["n_samples"].append(n)
                rows["n_windows"].append(nw)
                rows["rms0"].append(rms0)
                rows["zcr0"].append(zcr0)
            yield pd.DataFrame(rows)

    return media.mapInPandas(batches, schema=AUDIO_FEATURE_SCHEMA)


FRAME_FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("frame_index", T.IntegerType(), False),
        T.StructField("frame_ts_ms", T.LongType(), False),
        T.StructField("frame_len", T.LongType(), False),
        T.StructField("feature", T.ArrayType(T.FloatType()), True),
        T.StructField("decode_ok", T.BooleanType(), False),
    ]
)


def frame_features(
    media: DataFrame, every_ms: int = 1000, max_frames: int = 8, dim: int = 8
) -> DataFrame:
    """ONE-PASS video → per-frame feature table: frame split + decode +
    feature extraction inside a single mapInPandas stage.

    At scale this matters: splitting and decoding in one pass reads the
    (potentially large) payload bytes once, and frame metadata
    (index / timestamp / byte length) rides along with the feature —
    no second scan of the videos and no join to re-attach metadata to
    features. Fan-out is bounded by ``max_frames``; frames sampled on
    the ``every_ms`` grid limited by ``duration_ms``, exactly like
    :func:`sample_frames`.
    """
    from dww_data_pipeline_spark.operators.media_codec import split_video_frames

    def _frames_of(payload: bytes) -> list[bytes]:
        try:
            return split_video_frames(payload, max_frames=max_frames)
        except ValueError:
            n = min(max_frames, max(1, len(payload) // 16))
            return [
                payload[(i * len(payload)) // max(n, 1) :][:16] for i in range(n)
            ]

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = (
            "media_id",
            "frame_index",
            "frame_ts_ms",
            "frame_len",
            "feature",
            "decode_ok",
        )
        for pdf in it:
            rows: dict[str, list] = {k: [] for k in cols}
            for mid, payload, dur in zip(
                pdf["media_id"], pdf["payload"], pdf["duration_ms"]
            ):
                if payload is None or dur is None:
                    continue
                frames = _frames_of(payload)
                n = min(len(frames), min(max_frames, max(1, int(dur) // every_ms)))
                for i in range(n):
                    try:
                        feat, ok = _decode_features(frames[i], dim), True
                    except NotImplementedError:
                        feat, ok = None, False
                    rows["media_id"].append(mid)
                    rows["frame_index"].append(i)
                    rows["frame_ts_ms"].append(i * every_ms)
                    rows["frame_len"].append(len(frames[i]))
                    rows["feature"].append(feat)
                    rows["decode_ok"].append(ok)
            yield pd.DataFrame(rows)

    return media.mapInPandas(batches, schema=FRAME_FEATURE_SCHEMA)


AHASH_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("decode_ok", T.BooleanType(), False),
        T.StructField("ahash", T.LongType(), True),
    ]
)


def image_ahash(media: DataFrame) -> DataFrame:
    """Perceptual AVERAGE-HASH per image via mapInPandas: decode the
    payload with the pure-NumPy codec, gray each pixel as the integer
    channel sum, set bit p iff n_pixels * gray_p > sum(gray) (the
    strict-mean comparison kept in exact integers — no float mean, so
    the hash is bit-stable across engines and platforms). Identical
    pixel content ⇒ identical hash; near-identical content usually
    collides too, which is the point of aHash bucketing. Undecodable
    payloads yield decode_ok=False, ahash NULL — never a raised batch
    (the extract_media_features contract)."""
    from dww_data_pipeline_spark.operators.media_codec import decode_image

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in it:
            ids, oks, hashes = [], [], []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                ok, hv = False, None
                try:
                    img = decode_image(
                        bytes(payload) if payload is not None else None
                    )
                except ValueError:
                    img = None
                if img is not None and img.size:
                    gray = img.astype(np.int64).sum(axis=2).ravel()
                    tot = int(gray.sum())
                    n = int(gray.size)
                    bits = n * gray > tot
                    hv = int(
                        sum(1 << p for p, b in enumerate(bits.tolist()) if b)
                    )
                    ok = True
                ids.append(mid)
                oks.append(ok)
                hashes.append(hv)
            yield pd.DataFrame(
                {"media_id": ids, "decode_ok": oks, "ahash": hashes}
            )

    return media.mapInPandas(batches, schema=AHASH_SCHEMA)


VAD_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("decode_ok", T.BooleanType(), False),
        T.StructField("n_windows", T.IntegerType(), True),
        T.StructField("n_active", T.IntegerType(), True),
        T.StructField("n_segments", T.IntegerType(), True),
        T.StructField("first_active", T.IntegerType(), True),
    ]
)


def audio_vad(media: DataFrame, window: int = 8, energy_threshold: int = 80000) -> DataFrame:
    """Voice-activity segmentation over A16 audio via mapInPandas:
    per window the INTEGER energy sum Σs² (exact in int64 — int16
    samples, window-bounded), active iff energy > threshold, then
    active runs become segments. The silence-trimming pass an audio
    training pipeline runs before transcription/featurization.
    Undecodable payloads yield decode_ok=False rows — the
    extract_media_features fallback contract."""
    from dww_data_pipeline_spark.operators.media_codec import decode_audio

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        cols = ("media_id", "decode_ok", "n_windows", "n_active", "n_segments", "first_active")
        for pdf in it:
            rows: dict[str, list] = {k: [] for k in cols}
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                ok = False
                nw = na = ns = fa = None
                try:
                    decoded = decode_audio(
                        bytes(payload) if payload is not None else None
                    )
                except ValueError:
                    decoded = None
                if decoded is not None:
                    _, samples = decoded
                    s = samples.astype(np.int64)
                    nfull = (len(s) // window) * window
                    wins = s[:nfull].reshape(-1, window)
                    energy = (wins * wins).sum(axis=1)
                    active = energy > energy_threshold
                    nw = int(len(active))
                    na = int(active.sum())
                    starts = np.flatnonzero(
                        active & ~np.concatenate(([False], active[:-1]))
                    )
                    ns = int(len(starts))
                    fa = int(starts[0]) if len(starts) else None
                    ok = True
                rows["media_id"].append(mid)
                rows["decode_ok"].append(ok)
                rows["n_windows"].append(nw)
                rows["n_active"].append(na)
                rows["n_segments"].append(ns)
                rows["first_active"].append(fa)
            yield pd.DataFrame(rows)

    return media.mapInPandas(batches, schema=VAD_SCHEMA)


ENERGY_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("decode_ok", T.BooleanType(), False),
        T.StructField("energies", T.ArrayType(T.LongType()), True),
    ]
)


def audio_frame_energies(media: DataFrame, frame: int = 4) -> DataFrame:
    """Decode A16 audio and reduce each clip to its per-frame INTEGER
    energy envelope (Σ s² over ``frame`` samples — exact in int64 for
    int16 samples at any realistic frame width). The decode stays in
    this one Arrow-batched stage; everything downstream (peak picking,
    fingerprint pairing) is JVM-side Column math over the bounded
    energies array. Undecodable payloads yield decode_ok=False — the
    extract_media_features fallback contract."""
    from dww_data_pipeline_spark.operators.media_codec import decode_audio

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in it:
            rows: dict[str, list] = {"media_id": [], "decode_ok": [], "energies": []}
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                ok, env = False, None
                try:
                    decoded = decode_audio(
                        bytes(payload) if payload is not None else None
                    )
                except ValueError:
                    decoded = None
                if decoded is not None:
                    _, samples = decoded
                    s = samples.astype(np.int64)
                    nfull = (len(s) // frame) * frame
                    env = [
                        int(e)
                        for e in (s[:nfull].reshape(-1, frame) ** 2).sum(axis=1)
                    ]
                    ok = True
                rows["media_id"].append(mid)
                rows["decode_ok"].append(ok)
                rows["energies"].append(env)
            yield pd.DataFrame(rows)

    return media.mapInPandas(batches, schema=ENERGY_SCHEMA)
