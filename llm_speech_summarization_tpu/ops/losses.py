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
