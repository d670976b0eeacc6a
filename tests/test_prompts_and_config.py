import os

import pytest

from llm_speech_summarization_tpu.configs import Config, load_config
from llm_speech_summarization_tpu.utils import (
    ByteTokenizer,
    compute_num_audio_embeds,
    prompt_template_for,
)

YAML_DIR = os.path.join(
    os.path.dirname(__file__), "..", "llm_speech_summarization_tpu", "configs", "yaml"
)


def brute_force_num_embeds(samples, sr=16000, factor=4):
    # frame count per the 20ms/10ms calculus, then pool by `factor` minus one
    num_embeds = (samples - int(sr * 0.01)) // int(sr * 0.02)
    return int(num_embeds // factor - 1)


def test_compute_num_audio_embeds_matches_bruteforce():
    for samples in [16000, 16001, 48000, 80000, 160000, 320000, 12345, 99999]:
        assert compute_num_audio_embeds(samples) == brute_force_num_embeds(samples)


def test_templates():
    t = prompt_template_for("meta-llama/Llama-3.2-3B-Instruct")
    assert t.prefix.startswith("<|start_header_id|>system")
    assert t.suffix.endswith("assistant<|end_header_id|>\n\n")
    m = prompt_template_for("GeneZC/MiniChat-2-3B")
    assert m.prefix.endswith("[|User|]")
    assert m.suffix == "</s>[|Assistant|]"
    # fallback selection (reference: inference.py:39-44)
    assert prompt_template_for("my-llama-finetune").prefix == t.prefix
    assert prompt_template_for("other-model").prefix == m.prefix
    assert t.full_text_prompt("hi") == f"{t.prefix} hi{t.suffix} "


@pytest.mark.parametrize(
    "name", ["llama3_hubert", "llama3_whisper", "minichat_hubert", "minichat_whisper", "tiny_test"]
)
def test_load_preset_configs(name):
    cfg = load_config(os.path.join(YAML_DIR, f"{name}.yaml"))
    assert isinstance(cfg, Config)
    assert cfg.audio.sampling_rate == 16000
    assert cfg.train.fd_loss_connector_layers[0] == 0
    if "whisper" in name:
        assert cfg.model.audio_encoder.base == "whisper"
    if name.startswith("minichat"):
        assert cfg.model.llm_type == "GeneZC/MiniChat-2-3B"


def test_config_rejects_unknown_keys():
    with pytest.raises(KeyError):
        load_config({"train": {"nonexistent_field": 1}})


def test_config_accepts_reference_num_gpus_key():
    cfg = load_config({"train": {"num_gpus": 1, "batch_size": 4}})
    assert cfg.train.batch_size == 4


def test_byte_tokenizer_roundtrip():
    tok = ByteTokenizer()
    ids = tok.encode("hello world", add_bos=True)
    assert ids[0] == tok.bos_id
    assert tok.decode(ids) == "hello world"
    assert tok.encode("x", add_bos=False) == [ord("x")]


def test_long_audio_config_loads():
    """The ring-attention long-audio preset parses and is self-consistent."""
    import os

    from llm_speech_summarization_tpu.configs import load_config

    path = os.path.join(
        os.path.dirname(__file__), "..", "llm_speech_summarization_tpu",
        "configs", "yaml", "llama3_hubert_long.yaml",
    )
    cfg = load_config(path)
    assert cfg.train.use_ring_attention
    assert cfg.train.mesh.seq == 8
    assert cfg.audio.max_seconds == 120.0
    # every seq bucket must shard over the seq axis
    for s in cfg.train.buckets.seq_lens:
        assert s % cfg.train.mesh.seq == 0
