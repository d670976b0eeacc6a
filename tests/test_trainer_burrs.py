"""Regression tests for the round-1 trainer correctness burrs (VERDICT #9):
tail-batch drop, empty-validation silence, lr_at/warmup mismatch, SIGTERM
handler leak."""

import os
import signal

import numpy as np

from llm_speech_summarization_tpu.configs import load_config
from llm_speech_summarization_tpu.train.state import lr_at, make_schedule

TINY_YAML = os.path.join(
    os.path.dirname(__file__), "..", "llm_speech_summarization_tpu", "configs", "yaml",
    "tiny_test.yaml",
)


def test_lr_at_matches_optimizer_schedule_with_warmup():
    cfg = load_config(TINY_YAML)
    cfg.train.optimizer.warmup_steps = 10
    sched = make_schedule(cfg, total_opt_steps=100)
    for step in (0, 3, 10, 11, 50, 100, 150):
        # lr_at is closed-form HOST math (no eager device ops per log
        # interval); it matches the optax schedule to f32 rounding
        got, want = lr_at(cfg, 100, step), float(sched(min(step, 100)))
        assert abs(got - want) <= 1e-7 + 1e-5 * abs(want), (step, got, want)
    # warmup actually ramps: lr rises then falls
    assert lr_at(cfg, 100, 2) < lr_at(cfg, 100, 10)
    assert lr_at(cfg, 100, 90) < lr_at(cfg, 100, 10)


def test_lr_at_linear_decay_without_warmup():
    cfg = load_config(TINY_YAML)
    assert cfg.train.optimizer.warmup_steps == 0
    lr0 = cfg.train.optimizer.lr
    assert np.isclose(lr_at(cfg, 100, 0), lr0)
    assert np.isclose(lr_at(cfg, 100, 50), 0.5 * lr0)
    assert np.isclose(lr_at(cfg, 100, 200), 0.0)


def _make_trainer(tmp_path, num_samples, batch_size):
    cfg = load_config(TINY_YAML)
    cfg.log.checkpoint_dir = str(tmp_path / "ckpt")
    cfg.log.log_dir = str(tmp_path / "logs")
    cfg.log.num_generate_samples = 0
    cfg.data.synthetic_num_samples = num_samples
    cfg.train.batch_size = batch_size
    cfg.train.steps = None
    cfg.train.epochs = 1

    from llm_speech_summarization_tpu.train.trainer import Trainer

    return cfg, Trainer(cfg, run_name="burrs")


def test_tail_batches_processed_and_small_val_reports_ppl(tmp_path, capsys):
    """7 samples at batch_size 4 → 2 train batches (4 + 3). The val set (the
    same 7 synthetic samples) is smaller than val_bs=8 for the tail — round 1
    silently produced ZERO eval batches below val_bs."""
    cfg, t = _make_trainer(tmp_path, num_samples=7, batch_size=4)
    batches = list(t._batches(t.train_ds, 4, shuffle=False, seed=0))
    assert [b.wav.shape[0] for b in batches] == [4, 3]

    t.validate(epoch=0)
    out = capsys.readouterr().out
    assert "audio_ppl=" in out  # perplexity was computed and reported


def test_val_smaller_than_val_bs_yields_one_batch(tmp_path):
    cfg, t = _make_trainer(tmp_path, num_samples=3, batch_size=8)
    batches = list(t._batches(t.val_ds, 8, shuffle=False, seed=0))
    assert len(batches) == 1 and batches[0].wav.shape[0] == len(t.val_ds)


def test_sigterm_handler_restored_after_max_steps_return(tmp_path):
    cfg, t = _make_trainer(tmp_path, num_samples=4, batch_size=2)
    cfg.train.steps = 1  # triggers the early-return path that leaked in r1
    before = signal.getsignal(signal.SIGTERM)
    t.train()
    assert signal.getsignal(signal.SIGTERM) is before


def test_multihost_loader_shards_index_space(tmp_path, monkeypatch):
    """With >1 process, each host collates a DISJOINT strided shard of the
    shuffled index space at batch_size/process_count — together covering
    every sample exactly once (SURVEY §2.3 per-host-shards row)."""
    import jax

    cfg, t = _make_trainer(tmp_path, num_samples=8, batch_size=4)

    def batches_for(pi):
        monkeypatch.setattr(jax, "process_count", lambda: 2)
        monkeypatch.setattr(jax, "process_index", lambda: pi)
        out = list(t._batches(t.train_ds, 4, shuffle=True, seed=7))
        monkeypatch.undo()
        return out

    b0 = batches_for(0)
    b1 = batches_for(1)
    # local batches are global/2, and both hosts cover 4 samples each
    assert sum(b.wav.shape[0] for b in b0) == 4
    assert sum(b.wav.shape[0] for b in b1) == 4
    # disjoint + complete: per-sample audio checksums identify samples
    def ids(batches):
        return sorted(
            round(float(np.sum(np.asarray(b.wav)[i])), 3)
            for b in batches
            for i in range(b.wav.shape[0])
        )

    ids0, ids1 = ids(b0), ids(b1)
    assert not set(ids0) & set(ids1)
    assert sorted(ids0 + ids1) == ids(
        t._batches(t.train_ds, 4, shuffle=True, seed=7)
    )


def test_resume_finishes_configured_epochs_not_more(tmp_path):
    """A resumed run FINISHES the configured total (range(start, epochs)) —
    the old start+epochs bound made every preempted+resumed run train
    tcfg.epochs EXTRA epochs (review finding)."""
    cfg, t = _make_trainer(tmp_path, num_samples=4, batch_size=2)
    cfg.train.epochs = 2
    cfg.log.validation_interval = 0  # checkpoint only at epoch ends
    t.train()
    steps_full = t.step
    assert steps_full == 2 * 2  # 2 epochs x 2 batches

    from llm_speech_summarization_tpu.train.trainer import Trainer

    # resume from the finished run: start_epoch == last epoch (reference
    # semantics repeat the checkpointed epoch), so at most ONE epoch of
    # extra steps — never tcfg.epochs more
    t2 = Trainer(cfg, run_name="burrs")
    assert t2.step == steps_full
    t2.train()
    assert t2.step <= steps_full + 2  # <= one repeated epoch, not 2 more


def test_multihost_loader_equal_shards_on_odd_dataset(tmp_path, monkeypatch):
    """With an indivisible dataset (9 rows, 2 processes), each process must
    yield the SAME batch structure — the jitted step and global-array
    assembly are collectives, so an extra strided row on one host would
    hang the other (review finding). The global remainder row is dropped."""
    import jax

    cfg, t = _make_trainer(tmp_path, num_samples=9, batch_size=4)

    def batches_for(pi):
        monkeypatch.setattr(jax, "process_count", lambda: 2)
        monkeypatch.setattr(jax, "process_index", lambda: pi)
        out = list(t._batches(t.train_ds, 4, shuffle=True, seed=7))
        monkeypatch.undo()
        return out

    b0, b1 = batches_for(0), batches_for(1)
    assert [b.wav.shape[0] for b in b0] == [b.wav.shape[0] for b in b1]
    assert sum(b.wav.shape[0] for b in b0) == 4  # 9 // 2 = 4 per process
