"""FLAC ingestion tests (VERDICT r1 #6): the test-only Python encoder
(tests/flac_writer.py) produces valid streams; the native C++ decoder and
the pure-Python mirror must BOTH reproduce the original samples exactly and
must agree with each other bit-for-bit."""

import os

import numpy as np
import pytest

from llm_speech_summarization_tpu.data import flac as pyflac
from llm_speech_summarization_tpu.data import native
from llm_speech_summarization_tpu.data.audio_io import load_audio

from flac_writer import encode_flac


def _tone(n, seed=0, amp=8000):
    rng = np.random.RandomState(seed)
    t = np.arange(n)
    x = amp * np.sin(2 * np.pi * 220 * t / 16000) + rng.randint(-200, 200, n)
    return np.clip(np.round(x), -32768, 32767).astype(np.int64)


def _decode_both(data: bytes):
    got_py = pyflac.decode_f32_mono(data)
    got_c, sr = native.flac_decode(data)
    np.testing.assert_array_equal(got_py, got_c)  # decoder-vs-decoder parity
    return got_c, sr


@pytest.mark.parametrize(
    "mode,wasted,porder",
    [
        ("verbatim", 0, 0),
        ("constant", 0, 0),
        ("fixed0", 0, 0),
        ("fixed1", 0, 0),
        ("fixed2", 0, 0),
        ("fixed3", 0, 0),
        ("fixed4", 0, 0),
        ("lpc", 0, 0),
        ("fixed2", 2, 0),   # wasted bits
        ("fixed2", 0, 2),   # 4 Rice partitions
        ("lpc", 0, 3),      # 8 Rice partitions
    ],
)
def test_mono_roundtrip(mode, wasted, porder):
    x = _tone(2500)
    if mode == "constant":
        x = np.full(2500, 1234, np.int64)
    if wasted:
        x = (x >> wasted) << wasted
    data = encode_flac([x], blocksize=1024, mode=mode, wasted=wasted, porder=porder)
    got, sr = _decode_both(data)
    assert sr == 16000
    np.testing.assert_allclose(got, x / 32768.0, atol=1e-7)


def test_stereo_independent_mixdown():
    L, R = _tone(2000, seed=1), _tone(2000, seed=2)
    data = encode_flac([L, R], mode="fixed2")
    got, _ = _decode_both(data)
    np.testing.assert_allclose(got, (L + R) / 2 / 32768.0, atol=1e-6)


def test_stereo_mid_side():
    L, R = _tone(2048, seed=3), _tone(2048, seed=4)
    data = encode_flac([L, R], mode="fixed2", mid_side=True)
    got, _ = _decode_both(data)
    np.testing.assert_allclose(got, (L + R) / 2 / 32768.0, atol=1e-6)


def test_unknown_total_samples_sizing_pass():
    x = _tone(1500)
    data = encode_flac([x], mode="fixed2", declared_total=0)
    got, _ = _decode_both(data)
    assert len(got) == 1500
    np.testing.assert_allclose(got, x / 32768.0, atol=1e-7)


def test_corrupt_stream_rejected():
    x = _tone(1024)
    data = bytearray(encode_flac([x], mode="verbatim"))
    data[len(data) // 2] ^= 0xFF  # flip bits inside a frame → CRC-16 mismatch
    with pytest.raises(Exception):
        native.flac_decode(bytes(data))
    with pytest.raises(Exception):
        pyflac.decode_f32_mono(bytes(data))


def test_flac_info():
    x = _tone(3000)
    data = encode_flac([x, x], sample_rate=24000)
    total, sr, ch, bps = native.flac_info(data)
    assert (total, sr, ch, bps) == (3000, 24000, 2, 16)


def test_load_audio_flac_with_resample(tmp_path):
    x = _tone(24000)
    p = tmp_path / "utt.flac"
    p.write_bytes(encode_flac([x], sample_rate=24000, mode="fixed2"))
    wav = load_audio(str(p), target_sr=16000)
    assert wav.dtype == np.float32
    assert abs(len(wav) - 16000) <= 2  # 1.0 s after 24k→16k resample
    # energy preserved within resampler tolerance
    assert 0.5 < np.std(wav) / np.std(x / 32768.0) < 1.5


def test_load_audio_rejects_unknown_container(tmp_path):
    p = tmp_path / "x.mp3"
    p.write_bytes(b"ID3\x04junkjunk")
    with pytest.raises(ValueError, match="unsupported audio container"):
        load_audio(str(p))


def test_librispeech_dir_ingestion(tmp_path):
    """LibriSpeech tree layout: spk/chap/spk-chap-utt.flac + trans.txt."""
    from llm_speech_summarization_tpu.data import load_librispeech_dir

    d = tmp_path / "19" / "198"
    d.mkdir(parents=True)
    waves = {}
    lines = []
    for i in range(3):
        utt = f"19-198-{i:04d}"
        x = _tone(1600 + 300 * i, seed=i)
        (d / f"{utt}.flac").write_bytes(encode_flac([x], mode="fixed2"))
        waves[utt] = x
        lines.append(f"{utt} HELLO WORLD {i}")
    (d / "19-198.trans.txt").write_text("\n".join(lines))
    # an orphan audio file without transcript is skipped
    (d / "19-198-9999.flac").write_bytes(encode_flac([_tone(800)], mode="fixed2"))

    ex = load_librispeech_dir(str(tmp_path))
    assert [e["text"] for e in ex] == [f"HELLO WORLD {i}" for i in range(3)]
    for i, e in enumerate(ex):
        np.testing.assert_allclose(
            e["audio"], waves[f"19-198-{i:04d}"] / 32768.0, atol=1e-7
        )
    # no-audio tree → None (cli/preprocess falls back to HF-disk loading)
    empty = tmp_path / "empty"
    empty.mkdir()
    assert load_librispeech_dir(str(empty)) is None


def test_infer_cli_accepts_flac(tmp_path):
    """End-to-end: cli.infer reads a .flac prompt (VERDICT done-criterion)."""
    x = _tone(8000)
    p = tmp_path / "prompt.flac"
    p.write_bytes(encode_flac([x], mode="fixed2"))

    from llm_speech_summarization_tpu.cli.infer import main as infer_main

    yaml = os.path.join(
        os.path.dirname(__file__), "..", "llm_speech_summarization_tpu",
        "configs", "yaml", "tiny_test.yaml",
    )
    infer_main(["-c", yaml, "--audio_file", str(p), "--max_new_tokens", "4"])
