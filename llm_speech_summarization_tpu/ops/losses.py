"""Training losses: response-window CE, logit distillation, feature distillation.

Masked/batched forms of the reference's batch-size-1 loops:
  * response_cross_entropy — per-sample mean CE over the response window,
    then mean over batch (reference: model/audio_llama.py:72-101).
  * soft_cross_entropy — -Σ softmax(teacher) · log_softmax(student), mean
    over supervised positions (reference: utils.py:167-178, applied to the
    last `num_labels` positions at trainer.py:347-354).
  * feature_distillation_loss — Σ_layers MSE over the response window
    (reference: trainer.py:358-370).

All reductions are computed in float32.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp


def _log_softmax(x: jnp.ndarray) -> jnp.ndarray:
    x = x.astype(jnp.float32)
    m = jax.lax.stop_gradient(jnp.max(x, axis=-1, keepdims=True))
    shifted = x - m
    return shifted - jnp.log(jnp.sum(jnp.exp(shifted), axis=-1, keepdims=True))


def response_cross_entropy(
    logits: jnp.ndarray, labels: jnp.ndarray, loss_mask: jnp.ndarray
) -> jnp.ndarray:
    """Next-token CE over masked positions.

    logits: (B, L, V); labels: (B, L) int32; loss_mask: (B, L) bool.
    Per-sample masked mean, then batch mean — matching the reference's
    per-sample CrossEntropyLoss followed by division by batch size
    (reference: model/audio_llama.py:92-101).
    """
    logp = _log_softmax(logits)
    nll = -jnp.take_along_axis(logp, labels[..., None].astype(jnp.int32), axis=-1)[..., 0]
    mask = loss_mask.astype(jnp.float32)
    per_sample = jnp.sum(nll * mask, axis=-1) / jnp.maximum(jnp.sum(mask, axis=-1), 1.0)
    # samples with an empty window contribute 0 but still divide — identical
    # to the reference only when every sample has a response (always true in
    # training data); we normalize by the count of non-empty samples instead.
    has_any = (jnp.sum(mask, axis=-1) > 0).astype(jnp.float32)
    return jnp.sum(per_sample * has_any) / jnp.maximum(jnp.sum(has_any), 1.0)


def response_nll_sum(
    logits: jnp.ndarray, labels: jnp.ndarray, loss_mask: jnp.ndarray
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Masked (sum_nll, token_count) over the response window.

    Exact token-weighted aggregation for validation perplexity: the caller
    accumulates both across batches and takes exp(Σnll / Σtokens), so every
    supervised token weighs equally regardless of batch or response length.
    This differs (slightly) from the reference's exp(mean per-SAMPLE NLL)
    (reference: trainer.py:510-514), which weighs short responses' tokens
    more; padded zero-response rows contribute zero tokens and drop out.
    """
    logp = _log_softmax(logits)
    nll = -jnp.take_along_axis(logp, labels[..., None].astype(jnp.int32), axis=-1)[..., 0]
    mask = loss_mask.astype(jnp.float32)
    return jnp.sum(nll * mask), jnp.sum(mask)


def soft_cross_entropy(
    student_logits: jnp.ndarray,
    teacher_logits: jnp.ndarray,
    mask: jnp.ndarray,
) -> jnp.ndarray:
    """Logit-distillation loss: -Σ_v p_teacher · log p_student, masked mean.

    student/teacher logits: (B, L, V); mask: (B, L) bool (the response
    window). The reference averages uniformly over the bs=1 window
    (reference: utils.py:173-175); the masked global mean here reduces to
    exactly that at batch size 1 and weights every supervised token equally
    at larger batches.
    """
    s_logp = _log_softmax(student_logits)
    t_prob = jax.nn.softmax(teacher_logits.astype(jnp.float32), axis=-1)
    ce = -jnp.sum(jax.lax.stop_gradient(t_prob) * s_logp, axis=-1)  # (B, L)
    m = mask.astype(jnp.float32)
    return jnp.sum(ce * m) / jnp.maximum(jnp.sum(m), 1.0)


def fused_ntp_ld_losses(
    student_hidden: jnp.ndarray,
    teacher_hidden: jnp.ndarray,
    head_vd: jnp.ndarray,
    labels: jnp.ndarray,
    loss_mask: jnp.ndarray,
    response_mask: jnp.ndarray,
    vocab_chunk: int = 8192,
    head_scale: jnp.ndarray | None = None,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """NTP + logit-distillation losses WITHOUT materializing (B, W, V) logits.

    The 128k-vocab logits tensor is the dominant training-memory slab even
    after response-window slicing; this computes both losses by scanning
    over vocab chunks with online log-sum-exp (the "flash" trick applied to
    the loss; SURVEY §2.2's fused softmax-CE KD kernel, realized as a
    remat-scanned XLA loop — the chunk matmuls are recomputed in backward,
    costing 3 extra lm_head passes, negligible next to the LLM forward).

    student_hidden/teacher_hidden: (B, W, D) final hidden states at the
    response window (teacher is stop-gradient'd internally).
    head_vd: (V, D) lm-head matrix in VOCAB-MAJOR layout (the embedding
    table itself for tied weights — row slices are contiguous, so no
    transposed copy of the 128k-row table is ever materialized). May be
    weight-only int8 (models/llama.py::quantize_llama_params) with its
    per-vocab-row ``head_scale`` (V,): each chunk dequantizes in the
    chunk matmul, so no bf16 copy of the 128k-row head ever exists.
    labels/loss_mask/response_mask: (B, W) as in the unfused losses.

    Returns (ntp_loss, ld_loss) matching response_cross_entropy /
    soft_cross_entropy exactly (up to fp summation order).
    """
    B, W, D = student_hidden.shape
    V = head_vd.shape[0]
    n_chunks = (V + vocab_chunk - 1) // vocab_chunk
    Vp = n_chunks * vocab_chunk
    head_p = jnp.pad(head_vd, ((0, Vp - V), (0, 0)))
    scale_p = None if head_scale is None else jnp.pad(head_scale, (0, Vp - V))
    sh = student_hidden.reshape(B * W, D)
    th = jax.lax.stop_gradient(teacher_hidden.reshape(B * W, D))
    labels_f = labels.reshape(B * W)
    N = B * W

    neg = jnp.float32(-1e30)

    # the TEACHER's logits must not differentiate the (shared) lm head:
    # with tied embeddings head_vd IS embed_tokens, and leaking the
    # teacher-softmax gradient through it diverges from
    # soft_cross_entropy's gradient (the teacher distribution is a
    # CONSTANT target) — latent while only enc_params train, wrong the
    # moment the head/embedding joins the optimizer
    head_sg = jax.lax.stop_gradient(head_p)
    scale_sg = None if scale_p is None else jax.lax.stop_gradient(scale_p)

    def chunk_logits(h, c, w_all=head_p, s_all=scale_p):
        w = jax.lax.dynamic_slice(w_all, (c * vocab_chunk, 0), (vocab_chunk, D))
        logits = jnp.einsum(
            "nd,vd->nv", h, w.astype(h.dtype), preferred_element_type=jnp.float32
        )
        if s_all is not None:  # int8 head: per-vocab-row dequant scale
            s = jax.lax.dynamic_slice(s_all, (c * vocab_chunk,), (vocab_chunk,))
            logits = logits * s.astype(jnp.float32)[None, :]
        # mask padded vocab tail
        v_idx = c * vocab_chunk + jnp.arange(vocab_chunk)
        return jnp.where(v_idx[None, :] < V, logits, neg)

    # ---- pass 1: online (max, sumexp) for student & teacher + extras.
    # extras accumulated relative to the RUNNING max, rescaled on update:
    #   t_dot = Σ_v exp(t_v − m_t) · s_v   (for Σ p_t·s)
    #   label_logit = s_{label}
    @jax.checkpoint
    def pass1(carry, c):
        m_s, l_s, m_t, l_t, t_dot, label_logit = carry
        ls = chunk_logits(sh, c)  # (N, Vc) f32
        lt = chunk_logits(th, c, w_all=head_sg, s_all=scale_sg)

        m_s_new = jnp.maximum(m_s, jnp.max(ls, axis=-1))
        l_s = l_s * jnp.exp(m_s - m_s_new) + jnp.sum(
            jnp.exp(ls - m_s_new[:, None]), axis=-1
        )
        m_t_new = jnp.maximum(m_t, jnp.max(lt, axis=-1))
        alpha_t = jnp.exp(m_t - m_t_new)
        l_t = l_t * alpha_t + jnp.sum(jnp.exp(lt - m_t_new[:, None]), axis=-1)
        t_dot = t_dot * alpha_t + jnp.sum(
            jnp.exp(lt - m_t_new[:, None]) * ls, axis=-1
        )

        # gather the label logit if it lives in this chunk
        rel = labels_f - c * vocab_chunk
        in_chunk = (rel >= 0) & (rel < vocab_chunk)
        gathered = jnp.take_along_axis(
            ls, jnp.clip(rel, 0, vocab_chunk - 1)[:, None], axis=1
        )[:, 0]
        label_logit = jnp.where(in_chunk, gathered, label_logit)
        return (m_s_new, l_s, m_t_new, l_t, t_dot, label_logit), None

    init = (
        jnp.full((N,), neg, jnp.float32),
        jnp.zeros((N,), jnp.float32),
        jnp.full((N,), neg, jnp.float32),
        jnp.zeros((N,), jnp.float32),
        jnp.zeros((N,), jnp.float32),
        jnp.full((N,), neg, jnp.float32),
    )
    (m_s, l_s, m_t, l_t, t_dot, label_logit), _ = jax.lax.scan(
        pass1, init, jnp.arange(n_chunks)
    )

    lse_s = m_s + jnp.log(jnp.maximum(l_s, 1e-30))  # (N,)

    # NTP: -(s_label - lse_s), per-sample mean then batch mean
    nll = (lse_s - label_logit).reshape(B, W)
    lm = loss_mask.astype(jnp.float32)
    per_sample = jnp.sum(nll * lm, axis=-1) / jnp.maximum(jnp.sum(lm, axis=-1), 1.0)
    has_any = (jnp.sum(lm, axis=-1) > 0).astype(jnp.float32)
    ntp = jnp.sum(per_sample * has_any) / jnp.maximum(jnp.sum(has_any), 1.0)

    # LD: -Σ_v p_t (s_v - lse_s) = lse_s - (Σ_v exp(t_v-m_t)·s_v) / l_t
    ld_per_pos = (lse_s - t_dot / jnp.maximum(l_t, 1e-30)).reshape(B, W)
    rm = response_mask.astype(jnp.float32)
    ld = jnp.sum(ld_per_pos * rm) / jnp.maximum(jnp.sum(rm), 1.0)
    return ntp, ld


def feature_distillation_loss(
    student_hidden: Sequence[jnp.ndarray],
    teacher_hidden: Sequence[jnp.ndarray],
    layers: Sequence[int],
    mask: jnp.ndarray,
) -> jnp.ndarray:
    """Σ over selected layers of masked-mean squared error on hidden states.

    hidden lists are indexed like HF `output_hidden_states`: index 0 is the
    embedding output, index i the output of block i (reference:
    trainer.py:360-367 indexes hidden_states[layer_idx] the same way).
    mask: (B, L) response-window mask.
    """
    m = mask.astype(jnp.float32)[..., None]
    denom = jnp.maximum(jnp.sum(m), 1.0)
    total = jnp.zeros((), jnp.float32)
    for layer_idx in layers:
        sh = student_hidden[layer_idx].astype(jnp.float32)
        th = jax.lax.stop_gradient(teacher_hidden[layer_idx].astype(jnp.float32))
        sq = jnp.square(sh - th) * m
        # mean over (masked positions × channels), like F.mse_loss over the
        # (1, num_labels, D) window at bs=1
        total = total + jnp.sum(sq) / (denom * sh.shape[-1])
    return total
