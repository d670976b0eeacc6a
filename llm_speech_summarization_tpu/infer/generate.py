"""Jitted generation: prefill on spliced embeddings + KV-cache decode loop.

The reference delegates generation to HF ``model.generate`` with
``inputs_embeds`` (reference: inference.py:55-74, trainer.py:530-545,
preprocess_data/utils.py:49-65) — an eager Python loop over single-token
forwards. Here the whole thing is ONE jitted function per
(prefill_len, max_new_tokens) bucket:

  * prefill: one batched forward over the left-padded embedding sequence,
    writing the KV cache and yielding the first sampled token (logits are
    computed for the final position only);
  * decode: ``lax.while_loop`` over single-token forwards with an early
    exit when every row has emitted EOS. Cache-slot validity is arithmetic
    ([pad_len, offset) per sample) — no mask arrays are carried — and on
    TPU the cache is read in place by the Pallas decode kernel
    (kernels/decode_attention.py);
  * greedy by default (the reference's choice, inference.py:58-64), with
    temperature sampling available behind the same switch HF exposes.

Static shapes throughout: cache length = prefill_len + max_new_tokens.
"""

from __future__ import annotations

from functools import partial
from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp

from ..models.llama import KVCache, LlamaConfig, init_kv_cache, llama_forward

GenerateFn = Callable[..., jnp.ndarray]


class _DecodeState(NamedTuple):
    step: jnp.ndarray  # scalar int32
    tokens: jnp.ndarray  # (B, max_new) emitted tokens (eos-padded)
    last_token: jnp.ndarray  # (B, 1)
    done: jnp.ndarray  # (B,)
    cache: KVCache
    rng: jax.Array
    seen: jnp.ndarray  # (B, V) bool iff repetition penalty on, else (B, 1)


def _apply_repetition_penalty(
    logits: jnp.ndarray, seen: jnp.ndarray, penalty: float
) -> jnp.ndarray:
    """HF-style repetition penalty over already-GENERATED tokens: seen
    tokens' logits shrink (divide if positive, multiply if negative). The
    reference documents greedy repetition loops as a known failure with
    'crop the output manually' as the workaround (reference:
    inference.py:169-171); this fixes it inside the jitted decode."""
    pen = jnp.where(logits > 0, logits / penalty, logits * penalty)
    return jnp.where(seen, pen, logits)


def _sample(
    logits: jnp.ndarray,
    temperature: float,
    rng: jax.Array,
    top_k: int = 0,
    top_p: float = 1.0,
) -> jnp.ndarray:
    """(B, V) logits → (B,) token ids.

    Greedy at temperature<=0 (the reference's setting); temperature /
    top-k / top-p sampling cover HF generate's common knobs (the reference
    left do_sample commented out, reference: inference.py:58-64).
    """
    if temperature <= 0.0:
        return jnp.argmax(logits, axis=-1).astype(jnp.int32)
    logits = logits / temperature
    if top_k > 0:
        kth = jnp.sort(logits, axis=-1)[:, -top_k][:, None]
        logits = jnp.where(logits < kth, -1e30, logits)
    if top_p < 1.0:
        sorted_logits = jnp.sort(logits, axis=-1)[:, ::-1]
        probs = jax.nn.softmax(sorted_logits, axis=-1)
        cum = jnp.cumsum(probs, axis=-1)
        # keep the smallest prefix with cumulative mass >= top_p
        cutoff_idx = jnp.sum(cum < top_p, axis=-1)
        cutoff = jnp.take_along_axis(sorted_logits, cutoff_idx[:, None], axis=-1)
        logits = jnp.where(logits < cutoff, -1e30, logits)
    return jax.random.categorical(rng, logits, axis=-1).astype(jnp.int32)


@partial(
    jax.jit,
    static_argnames=(
        "cfg", "max_new_tokens", "eos_id", "temperature", "top_k", "top_p",
        "cache_dtype", "repetition_penalty",
    ),
)
def greedy_generate(
    params,
    cfg: LlamaConfig,
    inputs_embeds: jnp.ndarray,
    attn_mask: jnp.ndarray,
    *,
    max_new_tokens: int,
    eos_id: int,
    temperature: float = 0.0,
    top_k: int = 0,
    top_p: float = 1.0,
    repetition_penalty: float = 1.0,
    rng: Optional[jax.Array] = None,
    cache_dtype=jnp.bfloat16,
    num_steps: Optional[jnp.ndarray] = None,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Generate up to ``max_new_tokens`` from a left-padded embeds batch.

    ``max_new_tokens`` is STATIC (it sizes the cache and output buffer and
    is bucketed by callers to bound compilations); ``num_steps`` is an
    optional TRACED cap below it, so a request for e.g. 3 tokens inside a
    64-token bucket runs 3 decode steps, not 64.

    Returns (tokens (B, max_new_tokens) int32, eos-padded; lengths (B,)).
    """
    B, L, _ = inputs_embeds.shape
    S = L + max_new_tokens
    if rng is None:
        rng = jax.random.PRNGKey(0)
    step_cap = (
        jnp.int32(max_new_tokens)
        if num_steps is None
        else jnp.minimum(jnp.asarray(num_steps, jnp.int32), max_new_tokens)
    )

    cache = init_kv_cache(cfg, B, S, dtype=cache_dtype)
    out = llama_forward(
        params,
        cfg,
        inputs_embeds=inputs_embeds,
        attn_mask=attn_mask,
        kv_cache=cache,
        cache_offset=jnp.int32(0),
        last_logit_only=True,
    )
    rng, k0 = jax.random.split(rng)
    first = _sample(out.logits[:, -1], temperature, k0, top_k, top_p)  # (B,)
    lens = jnp.sum(attn_mask.astype(jnp.int32), axis=1)  # (B,) real prefill lengths
    pad_lens = (L - lens).astype(jnp.int32)  # valid cache slots start here

    tokens0 = jnp.full((B, max_new_tokens), eos_id, jnp.int32)
    tokens0 = tokens0.at[:, 0].set(first)
    use_rep = repetition_penalty != 1.0
    seen0 = (
        jnp.zeros((B, cfg.vocab_size), bool).at[jnp.arange(B), first].set(True)
        if use_rep
        else jnp.zeros((B, 1), bool)  # dummy carry when the knob is off
    )
    state = _DecodeState(
        step=jnp.int32(1),
        tokens=tokens0,
        last_token=first[:, None],
        done=first == eos_id,
        cache=out.kv_cache,
        rng=rng,
        seen=seen0,
    )

    def cond(s: _DecodeState):
        return (s.step < step_cap) & ~jnp.all(s.done)

    def body(s: _DecodeState):
        offset = L + s.step - 1  # cache slot the fed token will be written to
        positions = (lens + s.step - 1)[:, None]
        # valid cache slots per sample: [pad_len, offset); the fed token
        # rides along as a fresh key inside the forward
        out = llama_forward(
            params,
            cfg,
            input_ids=s.last_token,
            attn_mask=jnp.ones((B, 1), bool),
            positions=positions,
            kv_cache=s.cache,
            cache_offset=offset,
            kv_pad_lens=pad_lens,
        )
        rng, k = jax.random.split(s.rng)
        logits = out.logits[:, 0]
        if use_rep:
            logits = _apply_repetition_penalty(logits, s.seen, repetition_penalty)
        nxt = _sample(logits, temperature, k, top_k, top_p)
        nxt = jnp.where(s.done, eos_id, nxt)
        tokens = jax.lax.dynamic_update_slice(s.tokens, nxt[:, None], (0, s.step))
        seen = s.seen.at[jnp.arange(B), nxt].set(True) if use_rep else s.seen
        return _DecodeState(
            step=s.step + 1,
            tokens=tokens,
            last_token=nxt[:, None],
            done=s.done | (nxt == eos_id),
            cache=out.kv_cache,
            rng=rng,
            seen=seen,
        )

    final = jax.lax.while_loop(cond, body, state)
    num = jnp.sum(
        jnp.cumsum((final.tokens == eos_id).astype(jnp.int32), axis=1) == 0, axis=1
    )
    num = jnp.minimum(num + 1, final.step)  # include the EOS token itself
    return final.tokens, num


def make_generate_fn(params, cfg: LlamaConfig, eos_id: int, temperature: float = 0.0):
    """Bind params/config into a (embeds, mask, max_new) → tokens callable."""

    def fn(inputs_embeds, attn_mask, max_new_tokens, rng=None):
        return greedy_generate(
            params,
            cfg,
            inputs_embeds,
            attn_mask,
            max_new_tokens=max_new_tokens,
            eos_id=eos_id,
            temperature=temperature,
            rng=rng,
        )

    return fn
