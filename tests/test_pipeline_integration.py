"""Full-pipeline integration: preprocess → HF dataset on disk → training.

This is the reference's main data flow (preprocess_data/*.py →
trainer.py dataloaders) exercised end to end on synthetic fixtures.
"""

import json
import os

import numpy as np
import pytest

from llm_speech_summarization_tpu.configs import load_config

TINY_YAML = os.path.join(
    os.path.dirname(__file__), "..", "llm_speech_summarization_tpu", "configs", "yaml",
    "tiny_test.yaml",
)


def test_preprocess_to_hf_disk_to_training(tmp_path):
    cfg = load_config(TINY_YAML)
    cfg.log.checkpoint_dir = str(tmp_path / "ckpt")
    cfg.log.log_dir = str(tmp_path / "logs")
    cfg.log.num_generate_samples = 0

    from llm_speech_summarization_tpu.data.datasets import SyntheticSpeechDataset
    from llm_speech_summarization_tpu.data.preprocess import (
        preprocess_examples,
        save_preprocessed,
    )
    from llm_speech_summarization_tpu.infer.engine import LLMSpeechTextInference

    engine = LLMSpeechTextInference(cfg)
    raw = SyntheticSpeechDataset(engine.tokenizer, num_samples=6, max_seconds=1.5)
    examples = [{"audio": raw[i]["audio"], "text": raw[i]["text"]} for i in range(6)]

    rows = preprocess_examples(
        examples, engine, engine.tokenizer, ctc_fn=None,
        max_seconds=cfg.audio.max_seconds, sampling_rate=cfg.audio.sampling_rate,
        response_batch_size=3,
    )
    assert len(rows) == 6
    for r in rows:
        assert isinstance(r["llm_response"], str)
        assert r["text_input_ids"][0] == engine.tokenizer.bos_id  # BOS kept on disk
        assert r["response_input_ids"][0] == engine.tokenizer.bos_id

    out_dir = str(tmp_path / "split_preprocessed.hf")
    save_preprocessed(rows, out_dir)

    # load through the hf_disk path (reference: trainer.py:201-223) and train
    cfg.data.source = "hf_disk"
    cfg.data.base_path = str(tmp_path)
    cfg.data.train_set = ("split_preprocessed.hf",)
    cfg.data.val_set = ("split_preprocessed.hf",)

    from llm_speech_summarization_tpu.data.datasets import HFDiskDataset

    ds = HFDiskDataset(cfg.data.base_path, list(cfg.data.train_set))
    item = ds[0]
    # loader strips BOS (reference collate-time convention, trainer.py:155-156)
    assert item["text_input_ids"][0] != engine.tokenizer.bos_id
    assert item["response_input_ids"][0] != engine.tokenizer.bos_id

    from llm_speech_summarization_tpu.train.trainer import Trainer

    cfg.train.steps = 2
    t = Trainer(cfg, run_name="pipe")
    t.train()
    assert t.step == 2
    metrics_file = os.path.join(cfg.log.log_dir, "pipe", "metrics.jsonl")
    records = [json.loads(line) for line in open(metrics_file)]
    assert any("train/total_loss" in r for r in records)


def test_lr_schedule_matches_torch_polynomial():
    """optax linear decay == torch PolynomialLR(power=1.0) (reference:
    trainer.py:106-110)."""
    torch = pytest.importorskip("torch")
    import optax

    lr0, total = 5e-5, 20
    sched = optax.linear_schedule(init_value=lr0, end_value=0.0, transition_steps=total)

    p = torch.nn.Parameter(torch.zeros(1))
    opt = torch.optim.AdamW([p], lr=lr0)
    tsched = torch.optim.lr_scheduler.PolynomialLR(opt, total_iters=total, power=1.0)
    for step in range(total + 2):
        ours = float(sched(step))
        theirs = tsched.get_last_lr()[0]
        assert abs(ours - theirs) < 1e-9 + 1e-5 * theirs, (step, ours, theirs)
        opt.step()
        tsched.step()


def test_metrics_writer_jsonl(tmp_path):
    from llm_speech_summarization_tpu.obs.writer import MetricsWriter

    w = MetricsWriter(str(tmp_path), jsonl=True, tensorboard=False)
    w.log_training({"ntp_loss": 1.5, "ld_loss": 0.5}, step=3)
    w.log_lr(1e-4, step=3)
    w.log_validation_perplexity(12.0, 11.0, step=3)
    w.log_audio_text_responses(3, prompt_texts=["hi"], audio_responses=["resp"])
    w.close()
    records = [json.loads(line) for line in open(tmp_path / "metrics.jsonl")]
    tags = set()
    for r in records:
        tags.update(r.keys())
    assert {"train/ntp_loss", "train/ld_loss", "learning_rate",
            "validation/audio_perplexity", "prompt"} <= tags


def test_flac_tree_to_preprocess_cli_to_training(tmp_path):
    """The complete reference user journey through OUR surfaces: a
    LibriSpeech-layout FLAC tree → the preprocess CLI (--input) → HF-disk
    split → Trainer. Joins the seams tests cover separately (FLAC decode,
    preprocessing, training) into one end-to-end run."""
    import numpy as np

    from tests.flac_writer import encode_flac

    # LibriSpeech tree: spk/chap/utt.flac + trans.txt
    d = tmp_path / "libri" / "7" / "70"
    d.mkdir(parents=True)
    rng = np.random.RandomState(0)
    lines = []
    for i in range(4):
        utt = f"7-70-{i:04d}"
        x = (rng.randn(12000) * 3000).astype(np.int16)
        (d / f"{utt}.flac").write_bytes(encode_flac([x], mode="fixed2"))
        lines.append(f"{utt} SOME SPOKEN WORDS NUMBER {i}")
    (d / "7-70.trans.txt").write_text("\n".join(lines))

    out = str(tmp_path / "train_preprocessed.hf")
    from llm_speech_summarization_tpu.cli.preprocess import main as preprocess_main

    preprocess_main([
        "-c", TINY_YAML, "--input", str(tmp_path / "libri"),
        "--output", out, "--batch_size", "4",
    ])

    cfg = load_config(TINY_YAML)
    cfg.log.checkpoint_dir = str(tmp_path / "ckpt")
    cfg.log.log_dir = str(tmp_path / "logs")
    cfg.log.num_generate_samples = 0
    cfg.data.source = "hf_disk"
    cfg.data.base_path = str(tmp_path)
    cfg.data.train_set = ("train_preprocessed.hf",)
    cfg.data.val_set = ("train_preprocessed.hf",)
    cfg.train.steps = 2

    from llm_speech_summarization_tpu.train.trainer import Trainer

    t = Trainer(cfg, run_name="flac_e2e")
    t.train()
    assert t.step == 2


def test_bulk_infer_cli_directory_to_jsonl(tmp_path):
    """Bulk inference journey: a directory of WAVs → cli.infer --audio_dir
    → JSONL, through the pipelined batch stream. Responses must equal the
    per-file engine path (the pipeline reorders uploads, not compute)."""
    import json

    import numpy as np
    from scipy.io import wavfile

    from llm_speech_summarization_tpu.cli.infer import main as infer_main
    from llm_speech_summarization_tpu.configs import load_config
    from llm_speech_summarization_tpu.data.audio_io import load_audio
    from llm_speech_summarization_tpu.infer.engine import LLMSpeechTextInference

    yaml = os.path.join(
        os.path.dirname(__file__), "..", "llm_speech_summarization_tpu",
        "configs", "yaml", "tiny_test.yaml",
    )
    d = tmp_path / "wavs"
    d.mkdir()
    rng = np.random.RandomState(4)
    for i in range(5):
        wav = (0.05 * rng.randn(8000 + 700 * i) * 32767).astype(np.int16)
        wavfile.write(str(d / f"utt{i}.wav"), 16000, wav)
    out = tmp_path / "bulk.jsonl"
    infer_main([
        "-c", yaml, "--audio_dir", str(d), "--output", str(out),
        "--batch_size", "2", "--max_new_tokens", "8",
    ])
    rows = [json.loads(line) for line in open(out)]
    assert len(rows) == 5
    assert [os.path.basename(r["file"]) for r in rows] == [
        f"utt{i}.wav" for i in range(5)
    ]
    cfg = load_config(yaml)
    eng = LLMSpeechTextInference(cfg)
    for r in rows:
        a = load_audio(r["file"], target_sr=cfg.audio.sampling_rate)
        assert r["response"] == eng.generate_audio_response(a, max_new_tokens=8)
