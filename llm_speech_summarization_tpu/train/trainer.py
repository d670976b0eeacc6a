"""Trainer: the training loop.

Role parity with the reference Trainer (reference: trainer.py:23-545) —
init (seed, dirs, writer, models, data, optimizer, resume), ``train()`` with
interval logging/validation, ``validate()`` with NLL/perplexity + sample
generations + checkpointing — re-designed for TPU:

  * one jitted KD step per audio bucket (train/step.py) instead of a
    per-sample Python loop under autocast+GradScaler (bf16 needs no loss
    scaling, so the reference's GradScaler machinery has no counterpart);
  * gradient accumulation is replaced by real batching (optax.MultiSteps
    honors configs that still ask for it);
  * all host-side RNG is seeded (the reference seeds only CUDA,
    reference: trainer.py:32);
  * checkpoints via Orbax with latest-resume (reference: trainer.py:113-132).
"""

from __future__ import annotations

import os
import random
import time
from typing import Iterator, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..configs import Config
from ..data.collate import collate_batch
from ..data.datasets import load_training_datasets
from ..models.audio_encoder import encoder_setup_from_config, init_audio_encoder
from ..models.llama import init_llama_params, llama_preset
from ..obs.writer import MetricsWriter
from ..utils.prompts import prompt_template_for
from ..utils.tokenizer import load_tokenizer
from . import checkpoint as ckpt
from .state import TrainState, lr_at, make_train_state
from .step import Batch, make_eval_step, make_train_step


class Trainer:
    def __init__(
        self,
        config: Config,
        run_name: str = "run",
        checkpoint_path: Optional[str] = None,
        mesh=None,
    ):
        self.config = config
        self.run_name = run_name
        self.mesh = mesh

        # seed everything (reference seeds only torch.cuda, trainer.py:32)
        seed = config.seed_everything
        random.seed(seed)
        np.random.seed(seed)
        self.rng = jax.random.PRNGKey(seed)

        self.checkpoint_dir = os.path.join(config.log.checkpoint_dir, run_name)
        self.log_dir = os.path.join(config.log.log_dir, run_name)
        os.makedirs(self.checkpoint_dir, exist_ok=True)
        os.makedirs(self.log_dir, exist_ok=True)
        self.writer = MetricsWriter(self.log_dir, jsonl=config.log.jsonl_metrics)

        # tokenizer + template token ids
        self.tokenizer = load_tokenizer(
            config.model.llm_type, config.model.tokenizer_path
        )
        tpl = prompt_template_for(config.model.llm_type)
        self.prefix_ids = jnp.asarray(self.tokenizer.encode(tpl.prefix, add_bos=True), jnp.int32)
        self.suffix_ids = jnp.asarray(self.tokenizer.encode(tpl.suffix, add_bos=False), jnp.int32)

        # models
        param_dtype = jnp.dtype(config.model.param_dtype)
        k_enc, k_llm, self.rng = jax.random.split(self.rng, 3)
        self.llm_cfg = llama_preset(config.model.llm_preset or config.model.llm_type)
        self.llm_params = init_llama_params(k_llm, self.llm_cfg, dtype=param_dtype)
        if config.model.llm_checkpoint:
            import orbax.checkpoint as ocp

            ckptr = ocp.StandardCheckpointer()
            self.llm_params = ckptr.restore(
                os.path.abspath(config.model.llm_checkpoint),
                {"llm_params": self.llm_params},
            )["llm_params"]
        if config.model.llm_weight_dtype == "int8":
            # weight-only int8 for the FROZEN llm in training too (the
            # serving path has had it since round 2): gradients never touch
            # llm weights, so quantization only perturbs the (already
            # approximate) teacher/student logits (~1% on the serving
            # measurement, PERF.md) while halving the 6.4 GB weight stream
            # read 4× per step (2 forwards + remat recompute + dx backward)
            # — and freeing the HBM headroom that made remat_policy
            # save_qkv OOM on one chip (PERF.md "Selective remat").
            from ..models.llama import quantize_llama_params

            self.llm_params = quantize_llama_params(self.llm_params)
        self.enc_setup = encoder_setup_from_config(config)
        enc_params = init_audio_encoder(k_enc, self.enc_setup, dtype=jnp.float32)

        # data
        self.train_ds, self.val_ds = load_training_datasets(config, self.tokenizer)

        # optimizer + state
        tcfg = config.train
        # ceil: the tail of each epoch is a (smaller) real batch
        steps_per_epoch = max(-(-len(self.train_ds) // tcfg.batch_size), 1)
        total_opt_steps = tcfg.epochs * steps_per_epoch // max(tcfg.grad_accum_interval, 1)
        self.total_opt_steps = max(total_opt_steps, 1)
        self.state, self.tx = make_train_state(config, enc_params, self.total_opt_steps)
        self.steps_per_epoch = steps_per_epoch

        # mesh placement: TP-shard the frozen LLM over "model", ZeRO-1-shard
        # the optimizer state over "data" (docs/DESIGN.md mesh strategy);
        # encoder params stay replicated (their grads all-reduce over "data")
        if self.mesh is not None:
            from ..parallel.sharding import (
                llama_param_spec,
                opt_state_spec,
                shard_params,
            )

            axes = dict(self.mesh.shape)
            if axes.get("model", 1) > 1:
                self.llm_params = shard_params(
                    self.mesh, self.llm_params, llama_param_spec(self.llm_params)
                )
            if axes.get("data", 1) > 1:
                self.state = self.state._replace(
                    opt_state=shard_params(
                        self.mesh,
                        self.state.opt_state,
                        opt_state_spec(self.state.opt_state, self.mesh),
                    )
                )

        # per-audio-bucket jitted steps
        self._train_steps = {}
        self._eval_steps = {}

        self.step = 0
        self.start_epoch = 0
        # batches consumed in the current epoch — saved in checkpoints so a
        # resumed run fast-forwards the deterministic epoch iterator and
        # continues the EXACT batch sequence (bit-identical continuation,
        # tests/test_multihost.py)
        self._epoch_step = 0
        self._resume_epoch_step = 0
        if checkpoint_path:
            self.load_checkpoint(checkpoint_path)
        else:
            latest = ckpt.latest_checkpoint(self.checkpoint_dir)
            if latest:
                self.load_checkpoint(latest)

    # ------------------------------------------------------------------

    def load_checkpoint(self, path: str):
        """Resume enc params + optimizer + step/epoch (reference: trainer.py:116-132)."""
        restored, step, epoch = ckpt.restore_train_checkpoint(
            path, self.state, mesh=self.mesh
        )
        self.state = TrainState(
            step=jnp.asarray(step, jnp.int32),
            enc_params=restored["enc_params"],
            opt_state=restored["opt_state"],
        )
        self.step = step
        self.start_epoch = epoch
        self._resume_epoch_step = int(restored.get("epoch_step", 0))
        print(
            f"Resumed from {path} at step {step}, epoch {epoch}"
            f" (+{self._resume_epoch_step} batches into it)"
        )

    def _seq_budget(self, audio_bucket: int) -> int:
        """Static spliced-sequence length for an audio bucket via shape eval."""
        enc_params_shape = jax.eval_shape(lambda: self.state.enc_params)
        wav = jax.ShapeDtypeStruct((1, audio_bucket), jnp.float32)
        lens = jax.ShapeDtypeStruct((1,), jnp.int32)

        def fwd(p, w, l):
            from ..models.audio_encoder import audio_encoder_forward

            return audio_encoder_forward(p, self.enc_setup, w, l)

        out, _ = jax.eval_shape(fwd, enc_params_shape, wav, lens)
        M = out.shape[1]
        P, S = self.prefix_ids.shape[0], self.suffix_ids.shape[0]
        R = self.config.train.buckets.max_response_tokens
        T = self.config.train.buckets.max_text_tokens
        # one shared length for student (audio) and teacher (text) sequences.
        # Rounded to 128 so the Pallas flash kernel (fwd + bwd both need
        # T % 128 == 0) engages in training — at 64-granularity the LLM
        # forward silently fell back to XLA masked attention.
        need = P + max(M, T) + S + R
        return ((need + 127) // 128) * 128

    def _ring_args(self, total_len: int) -> dict:
        """Ring-attention kwargs for make_train_step (config
        train.use_ring_attention + mesh.seq > 1): the spliced T is sharded
        over the mesh "seq" axis, so total_len must divide by it."""
        tcfg = self.config.train
        if not tcfg.use_ring_attention:
            return {}
        assert self.mesh is not None and "seq" in self.mesh.axis_names, (
            "use_ring_attention needs a mesh with a 'seq' axis (mesh.seq > 1)"
        )
        n_seq = self.mesh.shape["seq"]
        assert total_len % n_seq == 0, f"total_len={total_len} vs seq={n_seq}"
        return {"ring_mesh": self.mesh, "ring_axis": "seq"}

    def _get_train_step(self, audio_bucket: int):
        if audio_bucket not in self._train_steps:
            total_len = self._seq_budget(audio_bucket)
            self._train_steps[audio_bucket] = make_train_step(
                self.config, self.enc_setup, self.llm_cfg, self.tx,
                self.prefix_ids, self.suffix_ids, total_len,
                **self._ring_args(total_len),
            )
        return self._train_steps[audio_bucket]

    def _get_eval_step(self, audio_bucket: int):
        if audio_bucket not in self._eval_steps:
            total_len = self._seq_budget(audio_bucket)
            self._eval_steps[audio_bucket] = make_eval_step(
                self.config, self.enc_setup, self.llm_cfg,
                self.prefix_ids, self.suffix_ids, total_len,
                **self._ring_args(total_len),
            )
        return self._eval_steps[audio_bucket]

    def _batches(
        self, dataset, batch_size: int, shuffle: bool, seed: int, skip: int = 0
    ) -> Iterator[Batch]:
        """Collated batches with background prefetch.

        The reference's only concurrency is its DataLoader worker pool
        (reference: trainer.py:225-248, num_workers=4); here a thread pool
        collates `num_workers` batches ahead so the TPU never waits on the
        host pipeline.
        """
        idx = np.arange(len(dataset))
        if shuffle:
            np.random.RandomState(seed).shuffle(idx)
        # multi-host dp: every process draws a DISJOINT strided shard of the
        # (identically seeded) shuffled index space and collates its local
        # slice of the global batch; shard_batch assembles the global array
        # (SURVEY §2.3 multi-process-loading row — per-host shards)
        pc, pi = jax.process_count(), jax.process_index()
        if pc > 1:
            assert batch_size % pc == 0, (
                f"process count {pc} must divide the global batch {batch_size}"
            )
            # EQUAL shards: every process must yield the same number of
            # batches with the same tail sizes — the jitted step and
            # make_array_from_process_local_data are global collectives, so
            # a process with one extra strided row would hang the others.
            # Drop the global remainder (< pc rows per epoch).
            n = len(idx) // pc
            idx = idx[pi::pc][:n]
            batch_size = batch_size // pc
        bcfg = self.config.train.buckets
        use_ctc = self.enc_setup.downsample_method == "ctc_pool"
        max_ranges = (max(bcfg.audio_samples) // 320 // 4 + 8) if use_ctc else None

        def make(i):
            examples = [dataset[int(j)] for j in idx[i : i + batch_size]]
            return collate_batch(
                examples,
                audio_buckets=bcfg.audio_samples,
                max_text_tokens=bcfg.max_text_tokens,
                max_response_tokens=bcfg.max_response_tokens,
                max_pool_ranges=max_ranges,
            )

        # process ALL samples like the reference (trainer.py:237-248): the
        # tail yields one smaller batch — at most one extra compile per
        # (dataset, batch_size) since the tail size is fixed across epochs
        starts = list(range(0, len(idx), batch_size))
        # resume fast-forward: the shuffle is seeded per epoch, so dropping
        # the first `skip` starts replays the exact remaining batch sequence
        # without collating the already-consumed ones
        starts = starts[skip:]
        workers = max(self.config.train.num_workers, 1)
        if workers <= 1 or len(starts) <= 1:
            for i in starts:
                yield make(i)
            return

        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor(max_workers=workers) as pool:
            pending = [pool.submit(make, i) for i in starts[: workers + 1]]
            next_submit = workers + 1
            while pending:
                fut = pending.pop(0)
                if next_submit < len(starts):
                    pending.append(pool.submit(make, starts[next_submit]))
                    next_submit += 1
                yield fut.result()

    # ------------------------------------------------------------------

    def train(self):
        cfg = self.config
        tcfg = cfg.train
        log_int = cfg.log.log_interval
        val_int = cfg.log.validation_interval
        max_steps = tcfg.steps

        # preemption-safe: a SIGTERM (TPU-VM maintenance, spot reclaim)
        # checkpoints before exit so -p/auto-resume continues seamlessly
        # (the reference loses everything since its last validate,
        # reference: trainer.py:516-528). SIGTERM only — SIGINT stays
        # default so Ctrl-C interrupts hard.
        import signal

        self._stop_requested = False

        def _on_sigterm(signum, frame):
            self._stop_requested = True

        try:
            prev_handler = signal.signal(signal.SIGTERM, _on_sigterm)
        except ValueError:  # not in main thread
            prev_handler = None

        try:
            # resume FINISHES the configured total (reference semantics:
            # restored epoch resumes in place, trainer.py:116-132) — the
            # old start+epochs bound made every preempted+resumed run
            # train MORE total epochs than an uninterrupted one
            # env-gated device trace window: LSS_PROFILE_DIR=/tmp/trace
            # [LSS_PROFILE_STEPS=3] captures steps 2..2+N (skipping the
            # step-1 compile) for TensorBoard's profile plugin
            prof_dir = os.environ.get("LSS_PROFILE_DIR")
            prof_steps = int(os.environ.get("LSS_PROFILE_STEPS", "3"))
            for epoch in range(self.start_epoch, tcfg.epochs):
                print(f"Epoch {epoch}")
                t0 = time.time()
                # resumed epoch: skip the batches the checkpoint already
                # consumed (exact continuation); fresh epochs start at 0
                skip = self._resume_epoch_step if epoch == self.start_epoch else 0
                self._epoch_step = skip
                for batch in self._batches(
                    self.train_ds, tcfg.batch_size, True,
                    cfg.seed_everything + epoch, skip=skip,
                ):
                    if self.mesh is not None:
                        from ..parallel.sharding import pad_batch_rows, shard_batch

                        # tail batches pad (with zero-loss rows) so EVERY
                        # batch takes the same sharded placement — round 2
                        # silently ran non-divisible tails replicated
                        n_data = dict(self.mesh.shape).get("data", 1)
                        if batch.wav.shape[0] % n_data != 0:
                            batch = pad_batch_rows(batch, n_data)
                        batch = shard_batch(self.mesh, batch)
                    step_fn = self._get_train_step(batch.wav.shape[1])
                    self.state, metrics = step_fn(self.state, self.llm_params, batch)
                    self.step += 1
                    self._epoch_step += 1
                    if prof_dir:
                        import jax as _jax

                        if self.step == 2:
                            _jax.profiler.start_trace(prof_dir)
                        elif self.step == 2 + prof_steps:
                            _jax.profiler.stop_trace()
                            print(f"profile trace written to {prof_dir}")
                            prof_dir = None

                    if self.step % log_int == 0:
                        host = {k: float(v) for k, v in metrics.items()}
                        host["step_time_s"] = (time.time() - t0) / log_int
                        t0 = time.time()
                        self.writer.log_training(host, self.step)
                        self.writer.log_lr(
                            lr_at(cfg, self.total_opt_steps, self.step // max(tcfg.grad_accum_interval, 1)),
                            self.step,
                        )
                    if val_int and self.step % val_int == 0:
                        self.validate(epoch)
                        t0 = time.time()  # step_time_s must not bill eval time
                    if self._stop_requested:
                        print("SIGTERM received: checkpointing and stopping")
                        # preemption save BLOCKS (and drains any async save
                        # in flight): the process may die right after
                        ckpt.finalize_saves()
                        ckpt.save_train_checkpoint(
                            self.checkpoint_dir, self.step, epoch, self.state,
                            epoch_step=self._epoch_step,
                        )
                        return
                    if max_steps is not None and self.step >= max_steps:
                        self.validate(epoch)
                        return
                self.validate(epoch)
        finally:
            # restored on EVERY exit path (round 1 leaked the handler on
            # max-steps and SIGTERM returns); async checkpoint saves drain
            # here so callers can rely on the files after train() returns
            ckpt.finalize_saves()
            if prev_handler is not None:
                signal.signal(signal.SIGTERM, prev_handler)

    # ------------------------------------------------------------------

    def validate(self, epoch: int):
        """Eval NLL/perplexity + sample generations + checkpoint
        (reference: trainer.py:400-528)."""
        cfg = self.config
        # exact token-weighted aggregation: Σnll and Σtokens across every
        # batch, ppl = exp(Σnll/Σtokens) — padded zero-response rows
        # contribute zero tokens (see ops/losses.py::response_nll_sum for
        # the documented difference vs the reference's per-sample mean)
        audio_sum = audio_tok = text_sum = text_tok = 0.0
        n_batches = 0
        val_bs = min(cfg.train.batch_size, 8)
        pc = jax.process_count()
        if pc > 1:
            # _batches requires pc | batch_size (per-process shards)
            val_bs = max(pc, (val_bs // pc) * pc)
        for batch in self._batches(self.val_ds, val_bs, False, 0):
            if self.mesh is not None:
                # same placement contract as train(): pad non-divisible
                # tails (zero-response rows drop out of the token-weighted
                # NLL means) and shard — raw per-process arrays mixed with
                # mesh-sharded params are a placement error on multi-host
                from ..parallel.sharding import pad_batch_rows, shard_batch

                n_data = dict(self.mesh.shape).get("data", 1)
                if batch.wav.shape[0] % n_data != 0:
                    batch = pad_batch_rows(batch, n_data)
                batch = shard_batch(self.mesh, batch)
            eval_fn = self._get_eval_step(batch.wav.shape[1])
            a_sum, a_tok, t_sum, t_tok = eval_fn(
                self.state.enc_params, self.llm_params, batch
            )
            audio_sum += float(a_sum)
            audio_tok += float(a_tok)
            text_sum += float(t_sum)
            text_tok += float(t_tok)
            n_batches += 1
            # per-batch token-mean NLL for the step-level log
            self.writer.log_validation(
                float(a_sum) / max(float(a_tok), 1.0), self.step
            )

        if n_batches:
            audio_ppl = float(np.exp(audio_sum / max(audio_tok, 1.0)))
            text_ppl = float(np.exp(text_sum / max(text_tok, 1.0)))
            self.writer.log_validation_perplexity(audio_ppl, text_ppl, self.step)
            print(f"[val] step {self.step}: audio_ppl={audio_ppl:.3f} text_ppl={text_ppl:.3f}")

        # sample generations (reference: trainer.py:454-508)
        n_gen = cfg.log.num_generate_samples
        if n_gen > 0 and len(self.val_ds) > 0:
            if getattr(self, "_val_engine", None) is None:
                from ..infer.engine import LLMSpeechTextInference

                # ONE engine reused across validates (its jit wrappers and
                # prompt-program caches persist); encoder params refresh
                # per call below. mesh passes through so sharded llm_params
                # meet correctly-placed inputs (engine._dev_put).
                self._val_engine = LLMSpeechTextInference(
                    cfg,
                    audio_encoder_params=self.state.enc_params,
                    llm_params=self.llm_params,
                    llm_cfg=self.llm_cfg,
                    tokenizer=self.tokenizer,
                    mesh=self.mesh,
                )
            engine = self._val_engine
            engine.audio_encoder_params = self.state.enc_params
            use_ctc = self.enc_setup.downsample_method == "ctc_pool"
            prompts, audio_resps, text_resps, audios = [], [], [], []
            for i in range(min(n_gen, len(self.val_ds))):
                ex = self.val_ds[i]
                max_new = min(2 * max(len(ex["text_input_ids"]), 8), 128)
                ranges = (
                    np.asarray(ex["pool_ranges_4"], np.int32) if use_ctc else None
                )
                audio_resps.append(
                    engine.generate_audio_response(
                        ex["audio"], max_new_tokens=max_new,
                        ctc_pool_ranges=ranges,
                    )
                )
                text_resps.append(
                    engine.generate_text_response(ex["text"], max_new_tokens=max_new)
                )
                prompts.append(ex["text"])
                audios.append(ex["audio"])
            self.writer.log_audio_text_responses(
                self.step,
                prompt_audios=audios,
                prompt_texts=prompts,
                audio_responses=audio_resps,
                text_responses=text_resps,
                sampling_rate=cfg.audio.sampling_rate,
            )

        ckpt.save_train_checkpoint(
            self.checkpoint_dir, self.step, epoch, self.state,
            block=not cfg.log.async_checkpoint,
            epoch_step=self._epoch_step,
        )
