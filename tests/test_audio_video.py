"""WAV codec, MJPEG frame splitting, and the fused audio/video Spark stages.

The pure kernels are Spark-free; the stage tests ride the shared session
fixture. Exactness contracts exercised here back the `audio_features` and
`video_frames` generation-rule oracles (doc_id templates -> expected rows).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from core_spark.functions.jpeg import decode_jpeg, encode_jpeg, frame_spans_mjpeg
from core_spark.functions.wav import decode_wav, encode_wav, wav_header


class TestWav:
    def test_roundtrip_mono_and_stereo(self):
        rng = np.random.default_rng(7)
        for ch in (1, 2, 4):
            arr = rng.integers(-32768, 32767, size=(321, ch), dtype=np.int16)
            blob = encode_wav(arr, 8000)
            meta = wav_header(blob)
            assert meta == {"audio_ok": True, "audio_format": "audio/wav",
                            "channels": ch, "sample_rate": 8000,
                            "n_samples": 321, "n_bytes": len(blob),
                            "audio_error": None}
            out, rate = decode_wav(blob)
            assert rate == 8000 and np.array_equal(out, arr)

    def test_mono_1d_input(self):
        arr = np.array([5, -5, 5, -5], dtype=np.int16)
        out, _ = decode_wav(encode_wav(arr, 44100))
        assert out.shape == (4, 1) and np.array_equal(out[:, 0], arr)

    def test_extra_chunks_skipped(self):
        # a LIST chunk between fmt and data (word-aligned odd size)
        blob = encode_wav(np.ones((10, 1), np.int16), 16000)
        head, data = blob[:36], blob[36:]
        extra = b"LIST" + (7).to_bytes(4, "little") + b"INFOxyz" + b"\x00"
        patched = head + extra + data
        # fix RIFF size
        patched = (b"RIFF" + (len(patched) - 8).to_bytes(4, "little")
                   + patched[8:])
        meta = wav_header(patched)
        assert meta["audio_ok"] and meta["n_samples"] == 10
        out, _ = decode_wav(patched)
        assert out.shape == (10, 1)

    def test_error_as_data(self):
        blob = encode_wav(np.ones((50, 2), np.int16), 8000)
        # truncated data chunk: fmt fields survive, ok=False
        meta = wav_header(blob[:-3])
        assert not meta["audio_ok"]
        assert meta["audio_error"] == "truncated_payload"
        assert meta["channels"] == 2 and meta["sample_rate"] == 8000
        assert meta["n_samples"] is None
        # garbage / null / wrong magic
        assert wav_header(None)["audio_error"] == "null_blob"
        assert wav_header(b"RIFFxxxxAVI ")["audio_error"] == "unsupported_codec"
        assert wav_header(b"\x00" * 40)["audio_error"] == "unsupported_codec"
        assert wav_header(b"RIFF\x04\x00\x00\x00WAVE")["audio_error"] == "truncated_header"
        with pytest.raises(ValueError):
            decode_wav(blob[:-3])

    def test_non_pcm16_is_not_implemented(self):
        blob = bytearray(encode_wav(np.ones((4, 1), np.int16), 8000))
        blob[20] = 3  # fmt tag -> IEEE float
        meta = wav_header(bytes(blob))
        assert not meta["audio_ok"]
        assert meta["audio_error"].startswith("unsupported_wav_format")
        with pytest.raises(NotImplementedError):
            decode_wav(bytes(blob))

    def test_fuzz_never_raises_header(self):
        rng = np.random.default_rng(11)
        for _ in range(200):
            n = int(rng.integers(0, 120))
            junk = bytes(rng.integers(0, 256, n, dtype=np.uint8))
            for prefix in (b"", b"RIFF", b"RIFF\xff\xff\x00\x00WAVE"):
                wav_header(prefix + junk)  # must not raise


class TestMjpeg:
    def _frames(self, vals, w=6, h=5):
        return [np.full((h, w, 3), v, np.uint8) for v in vals]

    def test_split_and_decode(self):
        frames = self._frames([103, 128, 153])
        blob = b"".join(encode_jpeg(f) for f in frames)
        spans = frame_spans_mjpeg(blob)
        assert len(spans) == 3
        assert spans[0][0] == 0 and spans[-1][1] == len(blob)
        for (s, e), f in zip(spans, frames):
            assert np.array_equal(decode_jpeg(blob[s:e]), f)

    def test_marker_aware_not_pattern_scan(self):
        # plant a literal FFD9 inside an APP1 payload: a naive byte scan
        # would split there; the marker-aware walk must not
        payload = b"Exif\x00\x00\xff\xd9junk"
        app1 = b"\xff\xe1" + (len(payload) + 2).to_bytes(2, "big") + payload
        f = encode_jpeg(np.full((5, 4, 3), 128, np.uint8))
        blob = f[:2] + app1 + f[2:]
        spans = frame_spans_mjpeg(blob)
        assert len(spans) == 1 and spans[0] == (0, len(blob))
        assert np.array_equal(decode_jpeg(blob), np.full((5, 4, 3), 128, np.uint8))

    def test_truncation_and_garbage_raise(self):
        blob = b"".join(encode_jpeg(f) for f in self._frames([128, 148]))
        with pytest.raises(ValueError, match="mjpeg_truncated_frame"):
            frame_spans_mjpeg(blob[:-2])  # EOI of the last frame cut
        with pytest.raises(ValueError, match="mjpeg_bad_frame_start"):
            frame_spans_mjpeg(b"notjpeg" + blob)
        with pytest.raises(ValueError, match="mjpeg_bad_frame_start"):
            frame_spans_mjpeg(blob + b"trailing")

    def test_subsampled_frames_split_too(self):
        blob = b"".join(encode_jpeg(f, subsample=True)
                        for f in self._frames([108, 133], w=16, h=16))
        assert len(frame_spans_mjpeg(blob)) == 2

    def test_restart_marker_frames(self):
        f = encode_jpeg(np.full((24, 24, 3), 118, np.uint8), restart_interval=2)
        assert len(frame_spans_mjpeg(f + f)) == 2

    def test_fuzz_terminates_raise_or_spans(self):
        """Junk, truncations, and random mutations of a valid stream must
        yield spans or a ValueError — never a hang or another exception."""
        rng = np.random.default_rng(23)
        stream = b"".join(encode_jpeg(np.full((6, 6, 3), v, np.uint8))
                          for v in (108, 128, 148))
        for _ in range(150):
            junk = bytes(rng.integers(0, 256, int(rng.integers(0, 200)),
                                      dtype=np.uint8))
            for blob in (junk, b"\xff\xd8" + junk, stream[:int(rng.integers(0, len(stream)))]):
                try:
                    frame_spans_mjpeg(blob)
                except ValueError:
                    pass
        mutated = bytearray(stream)
        for _ in range(150):
            i = int(rng.integers(0, len(mutated)))
            old = mutated[i]
            mutated[i] = int(rng.integers(0, 256))
            try:
                frame_spans_mjpeg(bytes(mutated))
            except ValueError:
                pass
            mutated[i] = old


@pytest.mark.spark
class TestAudioVideoStages:
    def test_audio_features_stage(self, spark):
        from core_spark.operators.multimodal import with_audio_features

        sq = np.tile(np.array([700, -700], np.int16), 40)  # 80 samples
        rows = [
            (0, bytearray(encode_wav(sq, 8000))),
            (1, bytearray(encode_wav(np.column_stack([sq, sq]), 16000))),
            (2, None),
            (3, bytearray(encode_wav(sq, 8000))[:-3]),  # truncated
            (4, bytearray(b"RIFFxxxxAVI junk")),
        ]
        df = spark.createDataFrame(rows, "media_id bigint, audio binary")
        out = with_audio_features(df).orderBy("media_id").toPandas()
        assert "audio" not in out.columns
        assert out["audio_ok"].tolist() == [True, True, False, False, False]
        assert out["duration_s"].iloc[0] == 80 / 8000
        assert out["duration_s"].iloc[1] == 80 / 16000
        assert out["peak_amp"].iloc[0] == 700 and out["mean_abs"].iloc[0] == 700.0
        assert out["channels"].iloc[1] == 2
        assert out["audio_error"].iloc[2] == "null_blob"
        assert out["audio_error"].iloc[3] == "truncated_payload"
        assert out["channels"].iloc[3] == 1  # fmt fields survive truncation
        assert out["audio_error"].iloc[4] == "unsupported_codec"
        # ONE fused Arrow stage
        plan = with_audio_features(df)._jdf.queryExecution().executedPlan().toString()
        assert plan.count("MapInPandas") == 1

    def test_video_frames_stage(self, spark):
        from core_spark.operators.multimodal import with_video_frames

        def stream(vals, w=6, h=5):
            return b"".join(
                encode_jpeg(np.full((h, w, 3), v, np.uint8)) for v in vals)

        good = stream([103, 128, 153, 178], w=7, h=4)
        rows = [
            (0, bytearray(good)),
            (1, bytearray(stream([113]))),
            (2, None),
            (3, bytearray(good)[:-2]),  # truncated last frame
        ]
        df = spark.createDataFrame(rows, "media_id bigint, video binary")
        out = with_video_frames(df, every=2).orderBy(
            "media_id", "frame_idx").toPandas()
        g = out[out.media_id == 0]
        assert g["frame_idx"].tolist() == [0, 2]  # every 2nd of 4 frames
        assert g["n_frames"].tolist() == [4, 4]
        assert g["frame_mean"].tolist() == [103.0, 153.0]
        assert g["frame_w"].tolist() == [7, 7] and g["frame_h"].tolist() == [4, 4]
        one = out[out.media_id == 1]
        assert one["frame_idx"].tolist() == [0] and one["frame_mean"].iloc[0] == 113.0
        errs = out[out.media_id.isin([2, 3])]
        assert errs["video_ok"].tolist() == [False, False]
        assert errs["video_error"].tolist() == ["null_blob", "mjpeg_truncated_frame"]
        assert errs["frame_idx"].isna().all()
        plan = with_video_frames(df)._jdf.queryExecution().executedPlan().toString()
        assert plan.count("MapInPandas") == 1

    def test_mid_stream_corrupt_frame_is_transactional(self, spark):
        """A stream whose 2nd frame splits cleanly but fails to decode
        (SOI+EOI, no SOF/SOS) yields ONE error row for that doc — the
        partial ok rows are dropped, never mixed with the error row."""
        from core_spark.operators.multimodal import with_video_frames

        good = encode_jpeg(np.full((5, 4, 3), 128, np.uint8))
        bad_tail = good + b"\xff\xd8\xff\xd9"  # frame 1 has no SOF/SOS
        assert len(frame_spans_mjpeg(bad_tail)) == 2  # splitter is fine with it
        df = spark.createDataFrame(
            [(0, bytearray(bad_tail)), (1, bytearray(good * 2))],
            "media_id bigint, video binary")
        out = with_video_frames(df).toPandas().sort_values(
            ["media_id", "frame_idx"])
        doc0 = out[out["media_id"] == 0]
        assert len(doc0) == 1 and not doc0["video_ok"].iloc[0]
        assert doc0["video_error"].iloc[0] == "truncated_header"
        doc1 = out[out["media_id"] == 1]
        assert len(doc1) == 2 and doc1["video_ok"].all()

    def test_every_must_be_positive(self, spark):
        from core_spark.operators.multimodal import with_video_frames

        df = spark.createDataFrame([(0, bytearray(b""))],
                                   "media_id bigint, video binary")
        with pytest.raises(ValueError, match="every"):
            with_video_frames(df, every=0)

    def test_zero_frame_stream_and_empty_tables(self, spark):
        """A 0-byte stream is a visible n_frames=0 row (every input doc
        appears at least once), and all three fused stages accept an empty
        input table without failing."""
        from core_spark.operators.multimodal import (
            with_audio_features,
            with_media_features,
            with_video_frames,
        )

        df = spark.createDataFrame(
            [(0, bytearray(b""))], "media_id bigint, video binary")
        out = with_video_frames(df).toPandas()
        assert len(out) == 1
        assert bool(out["video_ok"].iloc[0]) and out["n_frames"].iloc[0] == 0
        assert out["video_error"].iloc[0] is None and pd.isna(out["frame_idx"].iloc[0])

        empty = spark.createDataFrame([], "media_id bigint, media binary")
        assert with_media_features(empty).count() == 0
        assert with_video_frames(
            empty.withColumnRenamed("media", "video")).count() == 0
        assert with_audio_features(
            empty.withColumnRenamed("media", "audio")).count() == 0
