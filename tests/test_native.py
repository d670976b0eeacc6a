import numpy as np
import pytest

from llm_speech_summarization_tpu.data import native


def test_pcm16_to_f32_mono_stereo():
    pcm = np.array([[16384, -16384], [32767, 32767], [0, 0]], np.int16)
    out = native.pcm16_to_f32_mono(pcm)
    np.testing.assert_allclose(out, [0.0, 32767 / 32768, 0.0], atol=1e-6)
    mono = native.pcm16_to_f32_mono(np.array([16384, -32768], np.int16))
    np.testing.assert_allclose(mono, [0.5, -1.0], atol=1e-6)


def test_resample_pure_tone():
    """Downsampling a pure tone must preserve its frequency content."""
    sr_in, sr_out, f0 = 48000, 16000, 440.0
    t = np.arange(sr_in) / sr_in
    wav = np.sin(2 * np.pi * f0 * t).astype(np.float32)
    out = native.resample(wav, sr_in, sr_out)
    assert abs(len(out) - sr_out) <= 1
    # dominant FFT bin should be at 440 Hz
    spec = np.abs(np.fft.rfft(out[: sr_out // 2]))
    peak_hz = np.argmax(spec) * sr_out / (sr_out // 2)
    assert abs(peak_hz - f0) < 4.0
    # amplitude roughly preserved
    mid = out[len(out) // 4 : len(out) // 2]
    assert 0.9 < np.max(np.abs(mid)) < 1.1


def test_resample_identity():
    wav = np.random.RandomState(0).randn(1000).astype(np.float32)
    out = native.resample(wav, 16000, 16000)
    np.testing.assert_array_equal(out, wav)


def test_pad_batch():
    clips = [np.ones(5, np.float32), np.full(9, 2.0, np.float32)]
    out, lens = native.pad_batch(clips, 8)
    assert out.shape == (2, 8)
    np.testing.assert_array_equal(lens, [5, 8])
    np.testing.assert_allclose(out[0, :5], 1.0)
    np.testing.assert_allclose(out[0, 5:], 0.0)
    np.testing.assert_allclose(out[1], 2.0)


def test_native_library_builds():
    # in this image the toolchain exists, so the native path should be live
    assert native.native_available(), "native libaudio_frontend.so failed to build"
