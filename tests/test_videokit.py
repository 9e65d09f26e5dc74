"""kernels/videokit — ISO BMFF metadata walk + the video_metadata
operator and its frame_sample_plan composition."""
import struct

import pytest

from webcrawl_spark.kernels.videokit import (
    UnsupportedVideo,
    build_mp4,
    parse_mp4,
    probe_video,
)


class TestParseMp4:
    def test_roundtrip_v0(self):
        m = parse_mp4(build_mp4(12.5, timescale=1000, width=640,
                                height=360, codec="avc1"))
        assert m["duration_s"] == pytest.approx(12.5)
        assert (m["width"], m["height"]) == (640, 360)
        assert m["codec"] == "avc1"
        assert m["brand"] == "isom"

    def test_roundtrip_v1_64bit_times(self):
        m = parse_mp4(build_mp4(3600.25, timescale=90000, width=1920,
                                height=1080, codec="hev1",
                                mvhd_version=1))
        assert m["duration_s"] == pytest.approx(3600.25)
        assert (m["width"], m["height"]) == (1920, 1080)
        assert m["codec"] == "hev1"

    def test_largesize_box(self):
        data = bytearray(build_mp4(2.0, width=64, height=48))
        # rewrite the trailing mdat as a size==1 (64-bit largesize) box
        (mdat_size,) = struct.unpack(">I", data[-24:-20])
        assert data[-20:-16] == b"mdat"
        body = bytes(data[-16:])
        data = bytes(data[:-24]) + struct.pack(">I", 1) + b"mdat" \
            + struct.pack(">Q", 16 + len(body)) + body
        m = parse_mp4(data)
        assert (m["width"], m["height"]) == (64, 48)

    def test_missing_moov(self):
        data = build_mp4(1.0)
        ftyp_end = struct.unpack(">I", data[:4])[0]
        with pytest.raises(ValueError):
            parse_mp4(data[:ftyp_end])

    def test_bad_box_size(self):
        data = bytearray(build_mp4(1.0))
        data[0:4] = struct.pack(">I", 3)      # size < 8
        with pytest.raises(ValueError):
            parse_mp4(bytes(data))


class TestWebm:
    def test_roundtrip(self):
        from webcrawl_spark.kernels.videokit import build_webm, parse_webm

        m = parse_webm(build_webm(42.5, width=1280, height=720,
                                  codec="V_VP9"))
        assert m["duration_s"] == pytest.approx(42.5)
        assert (m["width"], m["height"]) == (1280, 720)
        assert m["codec"] == "V_VP9"
        assert m["brand"] == "webm"

    def test_custom_timescale_and_mkv(self):
        from webcrawl_spark.kernels.videokit import build_webm, probe_video

        m = probe_video(build_webm(7.25, width=320, height=180,
                                   codec="V_AV1", timescale_ns=100_000,
                                   doctype="matroska"))
        assert m["format"] == "mkv"
        assert m["duration_s"] == pytest.approx(7.25)
        assert m["codec"] == "V_AV1"

    def test_probe_dispatches_webm(self):
        from webcrawl_spark.kernels.videokit import build_webm

        m = probe_video(build_webm(3.0, width=64, height=48))
        assert m["format"] == "webm"

    def test_garbage_ebml_raises(self):
        with pytest.raises(ValueError):
            probe_video(b"\x1a\x45\xdf\xa3\xff\xff\xff\xff")


class TestProbe:

    def test_avi_refuses(self):
        with pytest.raises(UnsupportedVideo) as e:
            probe_video(b"RIFF\x00\x00\x00\x00AVI LIST")
        assert e.value.fmt == "avi"

    def test_garbage(self):
        with pytest.raises(ValueError):
            probe_video(b"not a video")


class TestOperator:
    def test_video_metadata_and_plan(self, spark):
        from pyspark.sql import functions as F

        from webcrawl_spark.operators.multimodal import (
            frame_sample_plan, video_metadata,
        )

        from webcrawl_spark.kernels.videokit import build_webm

        rows = [
            ("v0", bytearray(build_mp4(10.0, width=320, height=240))),
            ("v1", bytearray(build_mp4(4.0, width=640, height=480,
                                       codec="av01"))),
            ("web", bytearray(build_webm(6.0, width=1280, height=720))),
            ("avi", bytearray(b"RIFF\x00\x00\x00\x00AVI LIST")),
            ("bad", bytearray(b"nope")),
        ]
        df = spark.createDataFrame(rows, "media_id string, payload binary")
        meta = video_metadata(df)
        out = {r["media_id"]: r for r in meta.collect()}
        assert out["v0"]["duration_s"] == pytest.approx(10.0)
        assert (out["v0"]["width"], out["v0"]["height"]) == (320, 240)
        assert out["v1"]["codec"] == "av01"
        assert out["web"]["format"] == "webm"
        assert out["web"]["codec"] == "V_VP9"
        assert (out["web"]["width"], out["web"]["height"]) == (1280, 720)
        assert out["avi"]["format"] == "unsupported:avi"
        assert out["bad"]["format"] == "error"

        # composition: real durations drive the sampling plan
        plan = frame_sample_plan(
            meta.filter(F.col("duration_s").isNotNull()), fps=0.5)
        frames = plan.groupBy("media_id").count().collect()
        by_id = {r["media_id"]: r["count"] for r in frames}
        assert by_id == {"v0": 5, "v1": 2, "web": 3}
