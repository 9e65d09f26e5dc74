"""kernels/audiokit — stdlib WAV decode (RIFF PCM) + refusal taxonomy.

Reference parity note: the reference has no audio engine; this kernel
serves the multimodal training-data operators (SURVEY §2 'beyond the
reference' family), mirroring the image kernel's decode/refuse contract.
"""
import struct

import numpy as np
import pytest

from webcrawl_spark.kernels.audiokit import (
    UnsupportedAudio,
    audio_feature_from_samples,
    decode_audio,
    decode_wav,
    encode_wav,
)


class TestWavRoundtrip:
    def test_16bit_mono(self):
        src = (np.arange(1000) * 131 % 65536 - 32768).astype(np.int64)
        rate, n, samples = decode_wav(encode_wav(src, 44100))
        assert (rate, n) == (44100, 1000)
        np.testing.assert_array_equal(samples, src)

    def test_8bit_scales_to_canonical_domain(self):
        src = np.array([-128, -1, 0, 1, 127], dtype=np.int64)
        rate, n, samples = decode_wav(encode_wav(src, 8000, bits=8))
        assert (rate, n) == (8000, 5)
        np.testing.assert_array_equal(samples, src * 256)

    def test_32bit_scales_down(self):
        src = np.array([-2**31, -65536, 0, 65536, 2**31 - 1],
                       dtype=np.int64)
        rate, n, samples = decode_wav(encode_wav(src, 48000, bits=32))
        assert n == 5
        # arithmetic shift = floor division by 2^16
        np.testing.assert_array_equal(samples, src >> 16)
        assert samples.min() >= -32768 and samples.max() <= 32767

    def test_stereo_integer_mono_mix(self):
        left = np.array([100, -300, 32767], dtype=np.int64)
        right = np.array([200, -101, 32767], dtype=np.int64)
        inter = np.empty(6, dtype=np.int64)
        inter[0::2], inter[1::2] = left, right
        rate, n, samples = decode_wav(encode_wav(inter, 22050, channels=2))
        assert n == 3
        # floor division: (-300 + -101) // 2 == -201 (not -200)
        np.testing.assert_array_equal(samples, (left + right) // 2)

    def test_extra_chunks_skipped(self):
        src = np.array([5, -5], dtype=np.int64)
        wav = bytearray(encode_wav(src, 8000))
        # splice a LIST chunk (odd-size → word-aligned) before fmt/data
        extra = b"LIST" + struct.pack("<I", 5) + b"INFOx" + b"\0"
        wav[12:12] = extra
        wav[4:8] = struct.pack("<I", len(wav) - 8 + len(extra))
        rate, n, samples = decode_wav(bytes(wav))
        assert (rate, n) == (8000, 2)
        np.testing.assert_array_equal(samples, src)


class TestRefusals:
    def test_non_pcm_format_tag(self):
        wav = bytearray(encode_wav(np.array([0], dtype=np.int64), 8000))
        wav[20:22] = struct.pack("<H", 3)      # IEEE float tag
        with pytest.raises(UnsupportedAudio) as e:
            decode_wav(bytes(wav))
        assert e.value.fmt == "wav"

    def test_24bit_refuses(self):
        wav = bytearray(encode_wav(np.array([0], dtype=np.int64), 8000))
        wav[34:36] = struct.pack("<H", 24)
        with pytest.raises(UnsupportedAudio):
            decode_wav(bytes(wav))

    def test_missing_data_chunk(self):
        with pytest.raises(ValueError):
            decode_wav(b"RIFF\x04\x00\x00\x00WAVE")

    @pytest.mark.parametrize("payload,fmt", [
        (b"ID3\x04 tag then frames", "mp3"),
        (b"\xff\xfb\x90\x00", "mp3"),
        (b"OggS\x00\x02 vorbis", "ogg"),
        (b"fLaC\x00\x00\x00\x22", "flac"),
        (b"\x00\x00\x00\x20ftypM4A ", "m4a"),
    ])
    def test_codec_formats_classify(self, payload, fmt):
        with pytest.raises(UnsupportedAudio) as e:
            decode_audio(payload)
        assert e.value.fmt == fmt

    def test_unknown_bytes_are_value_error(self):
        with pytest.raises(ValueError):
            decode_audio(b"plain text, not audio")


class TestFeature:
    def test_bins_are_integer_exact(self):
        # one sample per bin edge: bin = (s + 32768) // 8192
        src = np.array([-32768, -24576, -16384, -8192, 0, 8192, 16384,
                        24576, 32767], dtype=np.int64)
        feat = audio_feature_from_samples(src)
        counts = np.round(feat * len(src)).astype(int)
        # 32767 lands in bin 7 alongside 24576
        np.testing.assert_array_equal(counts, [1, 1, 1, 1, 1, 1, 1, 2])
        assert feat.dtype == np.float32

    def test_decode_audio_wav_passthrough(self):
        src = (np.arange(64) * 1021 % 65536 - 32768).astype(np.int64)
        fmt, rate, n, samples = decode_audio(encode_wav(src, 16000))
        assert (fmt, rate, n) == ("wav", 16000, 64)
        np.testing.assert_array_equal(samples, src)


class TestMalformed:
    def test_zero_sample_rate_is_value_error(self):
        wav = bytearray(encode_wav(np.array([0], dtype=np.int64), 8000))
        wav[24:28] = b"\x00\x00\x00\x00"       # fmt rate field
        with pytest.raises(ValueError):
            decode_wav(bytes(wav))

    def test_short_fmt_chunk_classifies_in_operator(self, spark):
        from webcrawl_spark.operators.multimodal import audio_features

        # struct.error (not ValueError) inside the kernel must still
        # classify as 'error', never kill the task
        wav = b"RIFF\x10\x00\x00\x00WAVEfmt \x04\x00\x00\x00\x01\x00\x01\x00"
        df = spark.createDataFrame([("m", bytearray(wav))],
                                   "media_id string, payload binary")
        assert audio_features(df, fake=False).collect()[0]["format"] \
            == "error"
