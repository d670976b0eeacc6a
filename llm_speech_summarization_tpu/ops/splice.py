"""Vectorized prompt splicing: [prefix | mid | suffix | response], left-padded.

This replaces the reference's per-sample Python assembly
(reference: utils.py:27-46 merge_prompt_response_tokens,
utils.py:49-73 merge_prompt_tokens, utils.py:76-82 construct_attention_mask,
utils.py:85-164 batch_full_embed_sequence) with a single static-shape
gather/select that jits cleanly and batches on TPU:

  * every sample's sequence is  [prefix(P) | mid(m_b) | suffix(S) | resp(r_b)]
    left-padded to a static total length L (right-aligned, exactly like the
    reference's F.pad(..., (max_len - L, 0)) left padding);
  * "mid" is a padded buffer of continuous embeddings — audio-encoder output
    for the student pass, embedded transcript tokens for the teacher pass,
    or text+audio interleaves at inference;
  * prefix includes BOS; suffix/response ids must already be BOS-stripped —
    the reference's ``[1:]`` convention (reference: utils.py:42-43,
    trainer.py:155-156, inference.py:117);
  * labels/loss masks implement the response-window next-token loss: logits
    at the last r_b .. 2nd-to-last positions predict response[1:]
    (reference: model/audio_llama.py:84-89), as masks instead of the
    reference's per-sample loop (reference: model/audio_llama.py:72-101).
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax.numpy as jnp


class SplicedBatch(NamedTuple):
    embeds: jnp.ndarray  # (B, L, D) left-padded input embeddings
    attn_mask: jnp.ndarray  # (B, L) bool, True at real positions
    labels: jnp.ndarray  # (B, L) int32 next-token targets (0 where unused)
    loss_mask: jnp.ndarray  # (B, L) bool, True where `labels` supervise
    response_mask: jnp.ndarray  # (B, L) bool, True at response positions (LD/FD window)
    seq_lens: jnp.ndarray  # (B,) true (unpadded) sequence lengths


def splice_sequences(
    embedding_table: jnp.ndarray,
    prefix_ids: jnp.ndarray,
    suffix_ids: jnp.ndarray,
    mid_embeds: jnp.ndarray,
    mid_lens: jnp.ndarray,
    response_ids: Optional[jnp.ndarray] = None,
    response_lens: Optional[jnp.ndarray] = None,
    total_len: Optional[int] = None,
    table_scale: Optional[jnp.ndarray] = None,
) -> SplicedBatch:
    """Assemble left-padded [prefix | mid | suffix | response] batches.

    embedding_table: (V, D) LLM token-embedding matrix. May be weight-only
        int8 (models/llama.py::quantize_llama_params) — pass its per-row
        ``table_scale`` (V,) and the dequant happens AFTER the (B, L)
        gather, so the full bf16 table is never materialized.
    prefix_ids:  (P,) int32 — template prefix, WITH leading BOS.
    suffix_ids:  (S,) int32 — template suffix, BOS already stripped.
    mid_embeds:  (B, M, D) — right-padded continuous embeddings.
    mid_lens:    (B,) int32 — valid lengths in mid_embeds.
    response_ids: (B, R) int32 right-padded, BOS stripped; None for
        generation-style prompts (reference: utils.py:49-73).
    response_lens: (B,) int32.
    total_len: static output length L; defaults to P + M + S + R.
    """
    dtype = mid_embeds.dtype
    B, M, D = mid_embeds.shape
    P = prefix_ids.shape[0]
    S = suffix_ids.shape[0]
    if response_ids is None:
        R = 0
        response_lens = jnp.zeros((B,), jnp.int32)
    else:
        R = response_ids.shape[1]
        assert response_lens is not None
    L = total_len if total_len is not None else P + M + S + R
    assert L >= P + M + S + R, f"total_len {L} < max possible {P + M + S + R}"

    mid_lens = mid_lens.astype(jnp.int32)
    response_lens = response_lens.astype(jnp.int32)
    seq_lens = P + mid_lens + S + response_lens  # (B,)
    pad = L - seq_lens  # (B,)

    t = jnp.arange(L, dtype=jnp.int32)[None, :]  # (1, L)
    u = t - pad[:, None]  # (B, L) position within the unpadded sequence

    b1 = P + mid_lens[:, None]  # end of mid
    b2 = b1 + S  # end of suffix
    in_prefix = (u >= 0) & (u < P)
    in_mid = (u >= P) & (u < b1)
    in_suffix = (u >= b1) & (u < b2)
    in_resp = (u >= b2) & (u < seq_lens[:, None])

    # Token-id plane (everything but mid). Clipped gathers keep indices in
    # range; the selects below kill the garbage lanes.
    # statically-empty segments skip their gather (a gather on a
    # zero-length array is a trace-time error; in_prefix/in_suffix are
    # all-False then, so zeros are never selected)
    pref_tok = prefix_ids[jnp.clip(u, 0, P - 1)] if P > 0 else jnp.zeros_like(u)
    suf_tok = (
        suffix_ids[jnp.clip(u - b1, 0, S - 1)] if S > 0 else jnp.zeros_like(u)
    )
    token_ids = jnp.where(in_prefix, pref_tok, 0)
    token_ids = jnp.where(in_suffix, suf_tok, token_ids)
    if R > 0:
        resp_idx = jnp.clip(u - b2, 0, R - 1)
        resp_tok = jnp.take_along_axis(response_ids, resp_idx, axis=1)
        token_ids = jnp.where(in_resp, resp_tok, token_ids)

    tok_embeds = embedding_table[token_ids].astype(dtype)  # (B, L, D)
    if table_scale is not None:
        tok_embeds = tok_embeds * table_scale[token_ids][..., None].astype(dtype)

    # Mid plane: gather from the padded mid buffer.
    mid_idx = jnp.clip(u - P, 0, M - 1)  # (B, L)
    mid_gathered = jnp.take_along_axis(mid_embeds, mid_idx[..., None], axis=1)

    embeds = jnp.where(in_mid[..., None], mid_gathered, tok_embeds)
    attn_mask = u >= 0
    # zero the pad region like the reference's F.pad zeros (utils.py:139-145)
    embeds = embeds * attn_mask[..., None].astype(dtype)

    # Next-token labels over the response window: position t supervises
    # t+1 when both are response positions (reference: audio_llama.py:84-89 —
    # the suffix→response[0] transition is NOT supervised).
    if R > 0:
        next_in_resp = jnp.pad(in_resp[:, 1:], ((0, 0), (0, 1)), constant_values=False)
        loss_mask = in_resp & next_in_resp
        next_u = u + 1
        next_resp_idx = jnp.clip(next_u - b2, 0, R - 1)
        labels = jnp.take_along_axis(response_ids, next_resp_idx, axis=1)
        labels = jnp.where(loss_mask, labels, 0)
    else:
        loss_mask = jnp.zeros_like(in_resp)
        labels = jnp.zeros((B, L), jnp.int32)

    return SplicedBatch(
        embeds=embeds,
        attn_mask=attn_mask,
        labels=labels,
        loss_mask=loss_mask,
        response_mask=in_resp,
        seq_lens=seq_lens,
    )


def concat_mid_buffers(
    a_embeds: jnp.ndarray,
    a_lens: jnp.ndarray,
    b_embeds: jnp.ndarray,
    b_lens: jnp.ndarray,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Right-pack two padded (B, *, D) buffers into one: [a_b | b_b] per sample.

    Used for interleaved text+audio prompts (additional text prompt placed
    before the audio embeddings, reference: inference.py:113-122) without
    leaving static shapes: output buffer length is A + Bm.
    """
    B, A, D = a_embeds.shape
    Bm = b_embeds.shape[1]
    M = A + Bm
    t = jnp.arange(M, dtype=jnp.int32)[None, :]
    a_lens = a_lens.astype(jnp.int32)
    b_lens = b_lens.astype(jnp.int32)
    in_a = t < a_lens[:, None]
    in_b = (t >= a_lens[:, None]) & (t < (a_lens + b_lens)[:, None])
    a_idx = jnp.clip(t, 0, A - 1)
    b_idx = jnp.clip(t - a_lens[:, None], 0, Bm - 1)
    a_g = jnp.take_along_axis(a_embeds, a_idx[..., None], axis=1)
    b_g = jnp.take_along_axis(b_embeds, b_idx[..., None], axis=1)
    out = jnp.where(in_a[..., None], a_g, jnp.where(in_b[..., None], b_g, 0))
    return out.astype(a_embeds.dtype), a_lens + b_lens
