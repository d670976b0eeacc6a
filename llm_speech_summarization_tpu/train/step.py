"""The jitted knowledge-distillation train step.

One fused, batched, static-shape function replacing the reference's
per-batch Python orchestration (reference: trainer.py:261-384):

  student:  waveform → audio encoder → [prefix|audio|suffix|response] splice
            → frozen LLM forward (grads flow through to the encoder)
  teacher:  [prefix|transcript|suffix|response] splice → same frozen LLM,
            stop-gradient (reference: trainer.py:337-344 under no_grad)

Both sequences are left-padded to the SAME static length, so the response
windows (the last r_b positions) land on identical indices — LD/FD
alignment is a shared mask instead of the reference's `[:, -num_labels:]`
slicing (reference: trainer.py:347-370). Student and teacher run as two
separate (B, L) LLM forwards: the teacher is gradient-free, and keeping it
out of the differentiated program keeps the dx backward and the remat
recompute B-wide (B·T rows already saturate the MXU).

Losses (reference: trainer.py:328-370):
  ntp — response-window CE (model/audio_llama.py:72-101)
  ld  — soft cross-entropy on response logits (utils.py:167-178)
  fd  — MSE on hidden states at configured layers (trainer.py:358-370)
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import optax

from ..configs import Config
from ..models.audio_encoder import AudioEncoderParams, audio_encoder_forward
from ..models.llama import LlamaConfig, llama_forward
from ..ops.losses import (
    feature_distillation_loss,
    fused_ntp_ld_losses,
    response_cross_entropy,
    response_nll_sum,
)
from ..ops.splice import splice_sequences
from ..data.batch import Batch
from .state import TrainState


def _embed_table(llm_params, compute_dtype):
    """(table, scale) for splicing. With a weight-only int8 frozen LLM
    (``model.llm_weight_dtype: int8`` — halves the dominant 6.4 GB weight
    stream AND frees the HBM headroom the ``save_qkv`` remat policy needs
    on one chip) the int8 rows pass through and splice_sequences dequants
    AFTER its (B, L) gather, so no bf16 copy of the 128k-row table is ever
    materialized inside the step."""
    emb = llm_params["embed_tokens"]
    if emb.dtype == jnp.int8:
        return emb, llm_params["embed_tokens_scale"]
    return emb.astype(compute_dtype), None


def _embed_rows(table, table_scale, ids, compute_dtype):
    rows = table[ids].astype(compute_dtype)
    if table_scale is not None:
        rows = rows * table_scale[ids][..., None].astype(compute_dtype)
    return rows


def _forward_losses(
    enc_params,
    llm_params,
    batch: Batch,
    *,
    enc_setup: AudioEncoderParams,
    llm_cfg: LlamaConfig,
    cfg: Config,
    prefix_ids: jnp.ndarray,
    suffix_ids: jnp.ndarray,
    total_len: int,
    remat: bool,
    ring_mesh=None,
    ring_axis: str = "seq",
):
    tcfg = cfg.train
    compute_dtype = jnp.dtype(cfg.model.compute_dtype)
    table, table_scale = _embed_table(llm_params, compute_dtype)

    # --- student: audio path (reference: trainer.py:277-322). With
    # train.encoder_sp the encoder frames shard over the ring's "seq" axis
    # too (long-audio path: conv halo exchange + bidirectional ring).
    enc_sp = {"sp_mesh": ring_mesh, "sp_axis": ring_axis} if (
        tcfg.encoder_sp and ring_mesh is not None
    ) else {}
    audio_embeds, emb_lens = audio_encoder_forward(
        enc_params,
        enc_setup,
        batch.wav.astype(compute_dtype),
        batch.wav_lens,
        ctc_pool_ranges=batch.ctc_pool_ranges,
        remat=remat,
        **enc_sp,
    )
    student = splice_sequences(
        table, prefix_ids, suffix_ids, audio_embeds, emb_lens,
        batch.response_ids, batch.response_lens, total_len=total_len,
        table_scale=table_scale,
    )

    need_teacher = tcfg.use_ld_loss or tcfg.use_fd_loss
    fd_layers = tuple(tcfg.fd_loss_connector_layers)
    # every loss lives in the response window, which is right-aligned by the
    # left-padded splice — logits/hidden are computed for the last W
    # positions only (W/T-times smaller 128k-vocab logits slab)
    W = batch.response_ids.shape[1] + 1

    losses = {}
    total = jnp.zeros((), jnp.float32)

    if need_teacher:
        # --- teacher: text path (reference: trainer.py:337-344). Token ids
        # are already BOS-stripped by the data layer (the reference strips
        # at collate, trainer.py:155-156).
        text_embeds = _embed_rows(table, table_scale, batch.text_ids, compute_dtype)
        teacher = splice_sequences(
            table, prefix_ids, suffix_ids, text_embeds, batch.text_lens,
            batch.response_ids, batch.response_lens, total_len=total_len,
            table_scale=table_scale,
        )
        # TWO forwards, not one stacked (2B, L): the teacher depends only on
        # the frozen llm_params, so keeping it in a separate program means
        # jax.grad builds NO backward for it — round 1 stacked them "to keep
        # the MXU fed", which silently made the dx backward AND the remat
        # recompute run 2B-wide for a gradient-free half (≈1/3 of the LLM
        # step cost; B·T rows already saturate the MXU). The fused loss
        # consumes final hidden states; (B, W, 128k) logits are never
        # materialized (ops/losses.py::fused_ntp_ld_losses).
        out = llama_forward(
            llm_params, llm_cfg,
            inputs_embeds=student.embeds, attn_mask=student.attn_mask,
            return_hidden=tcfg.use_fd_loss, hidden_window=W,
            compute_logits=False, return_final_hidden=True,
            logit_window=W, remat=remat, remat_policy=tcfg.remat_policy,
            ring_mesh=ring_mesh, ring_axis=ring_axis,
        )
        t_out = llama_forward(
            llm_params, llm_cfg,
            inputs_embeds=jax.lax.stop_gradient(teacher.embeds),
            attn_mask=teacher.attn_mask,
            return_hidden=tcfg.use_fd_loss, hidden_window=W,
            compute_logits=False, return_final_hidden=True,
            logit_window=W, remat=False,
            ring_mesh=ring_mesh, ring_axis=ring_axis,
        )
        if llm_cfg.tie_embeddings:
            head_vd = llm_params["embed_tokens"]
            head_scale = llm_params.get("embed_tokens_scale")
        else:
            head_vd = llm_params["lm_head"].T
            head_scale = llm_params.get("lm_head_scale")
        ntp, ld = fused_ntp_ld_losses(
            out.final_hidden,
            t_out.final_hidden,
            head_vd,
            student.labels[:, -W:],
            student.loss_mask[:, -W:],
            student.response_mask[:, -W:],
            head_scale=head_scale if head_vd.dtype == jnp.int8 else None,
        )
        if tcfg.use_fd_loss:
            s_hidden = out.hidden_states
            t_hidden = t_out.hidden_states
    else:
        out = llama_forward(
            llm_params, llm_cfg,
            inputs_embeds=student.embeds, attn_mask=student.attn_mask,
            return_hidden=False, logit_window=W, remat=remat,
            remat_policy=tcfg.remat_policy,
            ring_mesh=ring_mesh, ring_axis=ring_axis,
        )
        ntp = response_cross_entropy(
            out.logits, student.labels[:, -W:], student.loss_mask[:, -W:]
        )
        ld = None

    losses["ntp_loss"] = ntp
    total = total + tcfg.ntp_loss_weight * ntp

    if tcfg.use_ld_loss:
        # both sequences are right-aligned to the same L → shared window mask
        losses["ld_loss"] = ld
        total = total + tcfg.ld_loss_weight * ld

    if tcfg.use_fd_loss:
        fd = feature_distillation_loss(
            s_hidden, t_hidden, fd_layers, student.response_mask[:, -W:]
        )
        losses["fd_loss"] = fd
        total = total + tcfg.fd_loss_weight * fd

    losses["total_loss"] = total
    return total, losses


def make_train_step(
    cfg: Config,
    enc_setup: AudioEncoderParams,
    llm_cfg: LlamaConfig,
    tx,
    prefix_ids: jnp.ndarray,
    suffix_ids: jnp.ndarray,
    total_len: int,
    donate: bool = True,
    ring_mesh=None,
    ring_axis: str = "seq",
):
    """Build the jitted train step: (state, llm_params, batch) → (state, metrics).

    Gradients flow only into the encoder params; the LLM is frozen by
    construction (the reference kept a no-op LLM param group in AdamW,
    reference: trainer.py:98-105 — dropped here).

    ``ring_mesh``/``ring_axis``: when set (config ``train.use_ring_attention``
    + ``mesh.seq > 1``), the LLM forward/backward runs sequence-parallel ring
    attention with the spliced T sharded over that mesh axis.
    """

    def step_fn(state: TrainState, llm_params, batch: Batch):
        grad_fn = jax.value_and_grad(
            lambda ep: _forward_losses(
                ep, llm_params, batch,
                enc_setup=enc_setup, llm_cfg=llm_cfg, cfg=cfg,
                prefix_ids=prefix_ids, suffix_ids=suffix_ids,
                total_len=total_len, remat=cfg.train.remat,
                ring_mesh=ring_mesh, ring_axis=ring_axis,
            ),
            has_aux=True,
        )
        (_, losses), grads = grad_fn(state.enc_params)
        updates, new_opt_state = tx.update(grads, state.opt_state, state.enc_params)
        new_params = optax.apply_updates(state.enc_params, updates)
        metrics = dict(losses)
        metrics["grad_norm"] = jax.tree_util.tree_reduce(
            lambda a, g: a + jnp.sum(jnp.square(g.astype(jnp.float32))), grads, 0.0
        ) ** 0.5
        return TrainState(state.step + 1, new_params, new_opt_state), metrics

    return jax.jit(step_fn, donate_argnums=(0,) if donate else ())


def make_eval_step(
    cfg: Config,
    enc_setup: AudioEncoderParams,
    llm_cfg: LlamaConfig,
    prefix_ids: jnp.ndarray,
    suffix_ids: jnp.ndarray,
    total_len: int,
    ring_mesh=None,
    ring_axis: str = "seq",
):
    """Validation NLLs for audio- and text-prompted sequences
    (reference: trainer.py:440-451): returns per-batch
    ``(audio_sum_nll, audio_tokens, text_sum_nll, text_tokens)`` so the
    caller can aggregate an EXACT token-weighted perplexity across batches
    (exp(Σnll/Σtokens)); the reference instead exponentiates a mean of
    per-sample NLLs (reference: trainer.py:510-514), which weighs short
    responses' tokens more — documented difference, see
    ops/losses.py::response_nll_sum. ``ring_mesh``: long-audio configs
    validate sequence-parallel too — without it the eval forward would run
    the full unsharded attention per device and hit the very memory wall SP
    exists to avoid."""

    def eval_fn(enc_params, llm_params, batch: Batch):
        compute_dtype = jnp.dtype(cfg.model.compute_dtype)
        table, table_scale = _embed_table(llm_params, compute_dtype)
        enc_sp = {"sp_mesh": ring_mesh, "sp_axis": ring_axis} if (
            cfg.train.encoder_sp and ring_mesh is not None
        ) else {}
        audio_embeds, emb_lens = audio_encoder_forward(
            enc_params, enc_setup, batch.wav.astype(compute_dtype), batch.wav_lens,
            ctc_pool_ranges=batch.ctc_pool_ranges, **enc_sp,
        )
        student = splice_sequences(
            table, prefix_ids, suffix_ids, audio_embeds, emb_lens,
            batch.response_ids, batch.response_lens, total_len=total_len,
            table_scale=table_scale,
        )
        text_embeds = _embed_rows(table, table_scale, batch.text_ids, compute_dtype)
        teacher = splice_sequences(
            table, prefix_ids, suffix_ids, text_embeds, batch.text_lens,
            batch.response_ids, batch.response_lens, total_len=total_len,
            table_scale=table_scale,
        )
        embeds = jnp.concatenate([student.embeds, teacher.embeds], axis=0)
        masks = jnp.concatenate([student.attn_mask, teacher.attn_mask], axis=0)
        W = batch.response_ids.shape[1] + 1
        out = llama_forward(
            llm_params, llm_cfg, inputs_embeds=embeds, attn_mask=masks,
            logit_window=W, ring_mesh=ring_mesh, ring_axis=ring_axis,
        )
        B = batch.wav.shape[0]
        a_sum, a_tok = response_nll_sum(
            out.logits[:B], student.labels[:, -W:], student.loss_mask[:, -W:]
        )
        t_sum, t_tok = response_nll_sum(
            out.logits[B:], teacher.labels[:, -W:], teacher.loss_mask[:, -W:]
        )
        return a_sum, a_tok, t_sum, t_tok

    return jax.jit(eval_fn)
