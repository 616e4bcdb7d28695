"""Real-pixel multimodal path: pure-NumPy PPM/BMP codec + the Spark
operators that consume it (north-star multimodal columns — decode,
resize, frame-sample, feature-extract over real bytes)."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from dww_data_pipeline_spark.operators.media_codec import (
    decode_image,
    encode_bmp,
    encode_ppm,
    image_features,
    resize_nearest,
    split_video_frames,
)


def _gradient(h=4, w=6):
    arr = np.zeros((h, w, 3), dtype=np.uint8)
    for y in range(h):
        for x in range(w):
            arr[y, x] = (y * 40, x * 30, (y + x) * 10)
    return arr


class TestCodec:
    def test_ppm_p6_roundtrip_known_pixels(self):
        arr = _gradient()
        payload = encode_ppm(arr)
        assert payload.startswith(b"P6\n6 4\n255\n")
        out = decode_image(payload)
        assert out.shape == (4, 6, 3)
        assert np.array_equal(out, arr)
        # spot-check a known pixel value
        assert tuple(out[2, 3]) == (80, 90, 50)

    def test_ppm_p3_ascii_decode(self):
        payload = b"P3\n2 2\n255\n255 0 0  0 255 0\n0 0 255  10 20 30\n"
        out = decode_image(payload)
        assert out.shape == (2, 2, 3)
        assert tuple(out[0, 0]) == (255, 0, 0)
        assert tuple(out[1, 1]) == (10, 20, 30)

    def test_ppm_comment_headers(self):
        payload = b"P6\n# a comment\n2 1\n# another\n255\n" + bytes(6)
        out = decode_image(payload)
        assert out.shape == (1, 2, 3)

    def test_bmp_roundtrip(self):
        arr = _gradient(3, 5)  # odd width exercises row padding
        out = decode_image(encode_bmp(arr))
        assert np.array_equal(out, arr)

    def test_unknown_format_returns_none(self):
        assert decode_image(b"GIF89a....") is None
        assert decode_image(None) is None
        assert decode_image(b"P6\n9999 9999\n255\nshort") is None  # truncated

    def test_huge_header_tiny_body_rejected_without_allocation(self):
        # a ~30-byte payload declaring a 100000x100000 image must fail
        # as a clean ValueError->None (NOT attempt a 30 GB np.empty
        # that dies with MemoryError inside a Spark task)
        assert decode_image(b"P3\n100000 100000\n255\n1 2 3") is None

    def test_p3_overlong_sample_is_valueerror_not_overflow(self):
        # a >19-digit ASCII sample used to overflow the int64 store with
        # an OverflowError that escaped the ValueError-only catches and
        # killed the whole Spark task on one adversarial payload
        payload = b"P3\n1 1\n255\n12345678901234567890123 0 0"
        assert decode_image(payload) is None
        with pytest.raises(ValueError):
            split_video_frames(payload)

    def test_p3_sample_above_maxval_rejected(self):
        assert decode_image(b"P3\n1 1\n255\n256 0 0") is None

    def test_zero_dimension_images_rejected(self):
        # header-valid zero-dim payloads decode to (h, 0, 3) arrays that
        # crash resize (IndexError) and NaN-poison features downstream
        assert decode_image(b"P6\n0 5\n255\n") is None
        assert decode_image(b"P6\n5 0\n255\n") is None
        assert decode_image(b"P3\n0 0\n255\n") is None
        # zero-dim BMP: patch width bytes of an otherwise valid header
        bmp = bytearray(encode_bmp(_gradient(2, 2)))
        bmp[18:22] = (0).to_bytes(4, "little", signed=True)
        assert decode_image(bytes(bmp)) is None
        bmp = bytearray(encode_bmp(_gradient(2, 2)))
        bmp[22:26] = (0).to_bytes(4, "little", signed=True)
        assert decode_image(bytes(bmp)) is None
        bmp = bytearray(encode_bmp(_gradient(2, 2)))
        bmp[18:22] = (-3).to_bytes(4, "little", signed=True)  # negative width
        assert decode_image(bytes(bmp)) is None

    def test_resize_nearest_known_values(self):
        arr = np.array(
            [[[0, 0, 0], [100, 100, 100]], [[200, 200, 200], [50, 50, 50]]],
            dtype=np.uint8,
        )
        up = resize_nearest(arr, 4, 4)
        assert up.shape == (4, 4, 3)
        assert tuple(up[0, 0]) == (0, 0, 0)
        assert tuple(up[0, 3]) == (100, 100, 100)
        assert tuple(up[3, 0]) == (200, 200, 200)

    def test_image_features_uniform_image(self):
        arr = np.full((4, 4, 3), 255, dtype=np.uint8)
        f = image_features(arr, dim=8)
        assert len(f) == 8
        assert f[0] == pytest.approx(1.0)  # channel means
        assert f[3] == pytest.approx(0.0)  # channel stds
        assert f[7] == pytest.approx(1.0)  # all luma mass in top bin

    def test_split_video_frames(self):
        frames = [encode_ppm(_gradient(2, 2)), encode_ppm(_gradient(3, 3))]
        stream = b"".join(frames)
        got = split_video_frames(stream)
        assert got == frames
        assert split_video_frames(stream, max_frames=1) == frames[:1]
        with pytest.raises(ValueError):
            split_video_frames(b"not a ppm")


class TestSparkRealPixels:
    def test_extract_features_real_decode(self, spark):
        from dww_data_pipeline_spark.operators.documents import extract_media_features

        red = encode_ppm(np.full((2, 2, 3), [255, 0, 0], dtype=np.uint8))
        rows = [(1, "image", red), (2, "image", b"unknownbytes")]
        media = spark.createDataFrame(rows, ["media_id", "kind", "payload"])
        out = {r["media_id"]: r for r in extract_media_features(media, dim=8).collect()}
        # real decode: feature[0] is the exact red-channel mean
        assert out[1]["decode_ok"]
        assert out[1]["feature"][0] == pytest.approx(1.0)
        assert out[1]["feature"][1] == pytest.approx(0.0)
        # unknown format still flows via the hash fallback
        assert out[2]["decode_ok"] and len(out[2]["feature"]) == 8

    def test_jvm_synthesized_p3_decodes(self, spark):
        """The m1 pattern: images built from pure Spark expressions are
        REAL images to the codec."""
        from dww_data_pipeline_spark.operators.documents import extract_media_features
        from dww_data_pipeline_spark.plans.streaming_plans import _p3_image_expr

        df = spark.range(5).select(
            F.col("id").alias("media_id"), _p3_image_expr(F.col("id")).alias("payload")
        )
        payload = bytes(df.filter(F.col("media_id") == 3).collect()[0]["payload"])
        arr = decode_image(payload)
        assert arr is not None and arr.shape == (2, 2, 3)
        # pixel 0 value: pmod(3*7 + 0, 256) = 21
        assert int(arr[0, 0, 0]) == 21
        feats = extract_media_features(df, dim=8).collect()
        assert all(r["decode_ok"] for r in feats)

    def test_video_frame_sampling_real_frames(self, spark):
        from dww_data_pipeline_spark.operators.documents import sample_frames

        f0 = encode_ppm(np.full((2, 2, 3), 10, dtype=np.uint8))
        f1 = encode_ppm(np.full((2, 2, 3), 250, dtype=np.uint8))
        video = f0 + f1 + f0  # frame 2 duplicates frame 0
        rows = [(7, video, 3000)]
        media = spark.createDataFrame(rows, ["media_id", "payload", "duration_ms"])
        out = sorted(
            sample_frames(media, every_ms=1000, max_frames=8).collect(),
            key=lambda r: r["frame_index"],
        )
        assert len(out) == 3
        assert bytes(out[0]["payload"]) == f0
        assert bytes(out[1]["payload"]) == f1
        assert bytes(out[2]["payload"]) == f0

    def test_frame_features_one_pass_matches_composition(self, spark):
        """frame_features (single mapInPandas) must agree with the
        two-stage sample_frames -> extract_media_features composition
        on every frame's metadata and feature vector."""
        from dww_data_pipeline_spark.operators.documents import (
            extract_media_features,
            frame_features,
            sample_frames,
        )

        f0 = encode_ppm(np.arange(12, dtype=np.uint8).reshape(2, 2, 3))
        f1 = encode_ppm(np.full((2, 2, 3), 250, dtype=np.uint8))
        from dww_data_pipeline_spark.operators.documents import MEDIA_SCHEMA

        rows = [(7, "video", f0 + f1 + f0, None, None, None, 3000)]
        media = spark.createDataFrame(rows, MEDIA_SCHEMA)

        one_pass = {
            r["frame_index"]: r
            for r in frame_features(media, every_ms=1000, max_frames=8).collect()
        }
        frames = sample_frames(media, every_ms=1000, max_frames=8)
        staged = frames.select(
            (F.col("media_id") * 10 + F.col("frame_index")).alias("media_id"),
            F.lit("image").alias("kind"),
            "payload",
            F.lit(None).cast("string").alias("mime"),
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            F.lit(None).cast("long").alias("duration_ms"),
        )
        two_pass = {
            r["media_id"] % 10: r for r in extract_media_features(staged).collect()
        }
        assert set(one_pass) == set(two_pass) == {0, 1, 2}
        for idx, row in one_pass.items():
            assert row["decode_ok"] and two_pass[idx]["decode_ok"]
            assert row["feature"] == two_pass[idx]["feature"]
            assert row["frame_ts_ms"] == idx * 1000
            assert row["frame_len"] == len(f0 if idx != 1 else f1)

    def test_m2_pipeline_finds_duplicate_frames(self, spark, sf_dir):
        from dww_data_pipeline_spark.plans.registry import all_queries

        q = all_queries()["m2_video_frame_dedup"]
        pairs = q(spark, sf_dir).collect()
        assert pairs, "every video embeds a duplicate frame pair"
        # frames 0 and 2 of each video are identical -> equal aHash
        # pairs; frame ids: media_id*1000 + frame_index
        exact = {
            (r["video_id"])
            for r in pairs
            if r["frame_a"] % 1000 == 0 and r["frame_b"] % 1000 == 2
        }
        assert len(exact) > 50


class TestCodecProperties:
    """Fuzzed roundtrip invariants for the pure-NumPy codec."""

    def test_ppm_roundtrip_fuzz(self):
        rng = np.random.default_rng(7)
        for _ in range(25):
            h, w = int(rng.integers(1, 12)), int(rng.integers(1, 12))
            arr = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
            assert np.array_equal(decode_image(encode_ppm(arr)), arr)

    def test_bmp_roundtrip_fuzz(self):
        rng = np.random.default_rng(11)
        for _ in range(25):
            h, w = int(rng.integers(1, 12)), int(rng.integers(1, 12))
            arr = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
            assert np.array_equal(decode_image(encode_bmp(arr)), arr)

    def test_video_split_roundtrip_fuzz(self):
        rng = np.random.default_rng(13)
        for _ in range(10):
            frames = [
                encode_ppm(
                    rng.integers(
                        0, 256,
                        size=(int(rng.integers(1, 6)), int(rng.integers(1, 6)), 3),
                        dtype=np.uint8,
                    )
                )
                for _ in range(int(rng.integers(1, 6)))
            ]
            assert split_video_frames(b"".join(frames)) == frames

    def test_truncated_payload_fuzz_never_raises(self):
        """Every prefix of a valid payload either decodes or returns
        None — no uncaught exception may escape into a Spark task."""
        payload = encode_ppm(_gradient(3, 4))
        for cut in range(len(payload)):
            decode_image(payload[:cut])  # must not raise
        bmp = encode_bmp(_gradient(3, 4))
        for cut in range(len(bmp)):
            decode_image(bmp[:cut])


class TestAudioCodec:
    """A16 audio decode/feature invariants (m4's codec layer)."""

    def _clip(self, seed: int, n: int = 16) -> bytes:
        vals = [((seed * (5 * i + 11) + 3 * i) % 2048) - 1024 for i in range(n)]
        return f"A16\n8000 {n}\n{' '.join(map(str, vals))}".encode()

    def test_roundtrip_matches_first_principles(self):
        from dww_data_pipeline_spark.operators.media_codec import (
            audio_features,
            decode_audio,
        )

        for seed in (0, 1, 7, 123, 99991):
            rate, samples = decode_audio(self._clip(seed))
            assert rate == 8000 and len(samples) == 16
            wins = audio_features(samples, window=8)
            assert len(wins) == 2
            s = [((seed * (5 * i + 11) + 3 * i) % 2048) - 1024 for i in range(8)]
            exp_rms = (sum(x * x for x in s) / 8.0) ** 0.5 / 32768.0
            exp_zcr = sum(
                1 for i in range(1, 8) if s[i - 1] * s[i] < 0
            ) / 7.0
            assert wins[0] == (exp_rms, exp_zcr)

    def test_none_payload(self):
        from dww_data_pipeline_spark.operators.media_codec import decode_audio

        assert decode_audio(None) is None

    def test_malformed_only_raises_valueerror(self):
        """Adversarial payloads must raise ValueError and NOTHING else
        (the mapInPandas fallback catches only ValueError)."""
        import pytest

        from dww_data_pipeline_spark.operators.media_codec import decode_audio

        bad = [
            b"",
            b"A16",
            b"A16\n",
            b"A16\n8000\n1 2",                      # one header field
            b"A16\n8000 2 9\n1 2",                  # three header fields
            b"A16\nx 2\n1 2",                       # non-integer rate
            b"A16\n8000 3\n1 2",                    # count mismatch
            b"A16\n8000 2\n1 99999",                # out of int16 range
            b"A16\n8000 2\n1 " + b"9" * 40,         # > int64 digits
            b"A16\n0 2\n1 2",                       # zero rate
            b"A16\n8000 99999999999999\n",          # absurd count
            b"P6\n1 1\n255\nxyz",                   # wrong magic
        ]
        for payload in bad:
            with pytest.raises(ValueError):
                decode_audio(payload)
        # truncations of a valid clip: ValueError or success, never
        # another exception type
        clip = self._clip(5)
        for cut in range(len(clip)):
            try:
                decode_audio(clip[:cut])
            except ValueError:
                pass

    def test_zero_and_short_streams(self):
        from dww_data_pipeline_spark.operators.media_codec import (
            audio_features,
            decode_audio,
        )

        rate, samples = decode_audio(b"A16\n8000 0\n")
        assert rate == 8000 and len(samples) == 0
        assert audio_features(samples, window=8) == []
        _, short = decode_audio(b"A16\n8000 3\n1 -2 3")
        assert audio_features(short, window=8) == []  # partial window dropped
