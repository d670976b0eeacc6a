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
        "cache_dtype", "repetition_penalty", "attn_impl",
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
    sampling=None,
    attn_impl: str = "auto",
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Generate up to ``max_new_tokens`` from a left-padded embeds batch.

    ``max_new_tokens`` is STATIC (it sizes the cache and output buffer and
    is bucketed by callers to bound compilations); ``num_steps`` is an
    optional TRACED cap below it, so a request for e.g. 3 tokens inside a
    64-token bucket runs 3 decode steps, not 64.

    ``sampling``, when given, is a TRACED per-row override of the static
    temperature/top_k/top_p knobs: a tuple ``(rngs (B,2) uint32, temps
    (B,), top_ks (B,), top_ps (B,))`` from infer/sampling.py — one compiled
    program serves any greedy/sampling request mix (rows with temps<=0
    decode exact-greedy). Draw t of row b is a pure function of
    (rngs[b], len_b+t) — len_b the row's UNPADDED prompt length — so a
    seeded request replays identically in any batch composition.

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
    if sampling is not None:
        from .sampling import sample_rows

        s_rngs, s_temps, s_topks, s_topps = sampling

        def pick(rng_key, logits, position):
            # position: (B,) UNPADDED per-row counter — the draw for a
            # seeded request must not depend on what co-batched (bucketed
            # padding varies with the wave)
            return sample_rows(
                logits, s_rngs, position.astype(jnp.int32),
                s_temps, s_topks, s_topps,
            )
    else:
        def pick(rng_key, logits, position):
            return _sample(logits, temperature, rng_key, top_k, top_p)

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
    lens = jnp.sum(attn_mask.astype(jnp.int32), axis=1)  # (B,) real prefill lengths
    first = pick(k0, out.logits[:, -1], lens - 1)  # (B,)
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
            # None (not an explicit all-ones mask): the fresh decode token is
            # always real, and attn_mask=None is what licenses the fused
            # decode kernel (models/llama.py fresh_mask_implicit)
            attn_mask=None,
            positions=positions,
            kv_cache=s.cache,
            cache_offset=offset,
            kv_pad_lens=pad_lens,
            attn_impl=attn_impl,
        )
        rng, k = jax.random.split(s.rng)
        logits = out.logits[:, 0]
        if use_rep:
            logits = _apply_repetition_penalty(logits, s.seen, repetition_penalty)
        nxt = pick(k, logits, lens + s.step - 1)
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


def _ngram_propose(tokens: jnp.ndarray, t: jnp.ndarray, last: jnp.ndarray, k: int):
    """Self-speculative draft: continue the most recent earlier occurrence
    of the last emitted 2-gram (prompt-lookup decoding applied to the
    OUTPUT history — the audio prompt has no token ids to look up).
    tokens: (B, S) emitted so far (eos-padded); t: (B,) per-row emitted
    counts; last: (B,) the newest token per row. Rows without a match
    draft ``last`` repeated — greedy loops (the reference's documented
    failure mode, reference: inference.py:169-171) then verify at high
    acceptance."""
    B, S = tokens.shape
    g0 = tokens[jnp.arange(B), jnp.maximum(t - 2, 0)]  # (B,)
    g1 = last
    idx = jnp.arange(S, dtype=jnp.int32)[None, :]
    m = (
        (tokens == g0[:, None])
        & (jnp.roll(tokens, -1, axis=1) == g1[:, None])
        & (idx + 1 <= t[:, None] - 2)  # strictly before the trailing 2-gram
        & (t[:, None] >= 3)
    )
    best = jnp.max(jnp.where(m, idx, -1), axis=1)  # (B,) most recent match
    has = best >= 0
    cols = jnp.clip(best[:, None] + 2 + jnp.arange(k)[None, :], 0, S - 1)
    cont = jnp.take_along_axis(tokens, cols, axis=1)  # (B, k)
    in_range = (best[:, None] + 2 + jnp.arange(k)[None, :]) < t[:, None]
    draft = jnp.where(has[:, None] & in_range, cont, last[:, None])
    return draft.astype(jnp.int32)


def commit_verified_drafts(preds, draft, tokens, n_emitted, budgets, done,
                           last, eos_id: int):
    """Shared accept/commit core of speculative decoding — the one-shot
    ``speculative_generate`` below AND the serving slot decoder's spec
    chunks (infer/slots.py::_spec_chunk_fn) both call this, so the
    token-exactness contract (longest agreeing draft prefix + bonus
    token, first committed EOS truncates, budget prefix caps) lives in
    exactly one place.

    preds/draft: (B, k+1)/(B, k) from ONE verification forward;
    tokens: (B, cap) output buffer; budgets: per-row (B,) or a scalar
    upper bound; done/last/n_emitted: (B,) row state.
    Returns (tokens, n_add, last, done, commit)."""
    B, k1 = preds.shape
    # longest agreeing draft prefix; +1 bonus token always commits
    agree = jnp.cumprod((preds[:, :-1] == draft).astype(jnp.int32), axis=1)
    a = jnp.sum(agree, axis=1)  # (B,) accepted draft tokens
    j = jnp.arange(k1, dtype=jnp.int32)[None, :]
    commit = j <= a[:, None]  # (B, k+1) tokens emitted this round
    # stop at the first EOS among committed tokens (it commits, the rest don't)
    is_eos = (preds == eos_id).astype(jnp.int32)
    commit = commit & (jnp.cumsum(is_eos, axis=1) - is_eos == 0)
    budgets = jnp.broadcast_to(jnp.asarray(budgets, jnp.int32), (B,))
    commit = commit & (~done)[:, None] & (
        (n_emitted[:, None] + j) < budgets[:, None]
    )
    dest = jnp.clip(n_emitted[:, None] + j, 0, tokens.shape[1] - 1)
    tokens = jax.lax.fori_loop(
        0, k1,
        lambda i, tk: tk.at[jnp.arange(B), dest[:, i]].set(
            jnp.where(commit[:, i], preds[:, i], tk[jnp.arange(B), dest[:, i]])
        ),
        tokens,
    )
    n_add = jnp.sum(commit.astype(jnp.int32), axis=1)  # ≥1 for live rows
    last_new = jnp.take_along_axis(
        preds, jnp.maximum(n_add - 1, 0)[:, None], axis=1
    )[:, 0]
    last = jnp.where(done | (n_add == 0), last, last_new)
    done = (
        done
        | jnp.any((preds == eos_id) & commit, axis=1)
        | ((n_emitted + n_add) >= budgets)
    )
    return tokens, n_add, last, done, commit


@partial(
    jax.jit,
    static_argnames=("cfg", "max_new_tokens", "eos_id", "k", "cache_dtype"),
)
def speculative_generate(
    params,
    cfg: LlamaConfig,
    inputs_embeds: jnp.ndarray,
    attn_mask: jnp.ndarray,
    *,
    max_new_tokens: int,
    eos_id: int,
    k: int = 4,
    cache_dtype=jnp.bfloat16,
    draft_override: Optional[jnp.ndarray] = None,
    num_steps: Optional[jnp.ndarray] = None,
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Greedy generation with self-speculative (n-gram lookahead) decoding.

    Each round proposes ``k`` draft tokens (``_ngram_propose``) and runs ONE
    (k+1)-token verification forward; the longest agreeing prefix plus the
    model's bonus token all commit in that round. Decode is weight-stream
    bound, so the (k+1)-token forward costs barely more than a 1-token step
    — at draft-acceptance rate α each round emits 1+αk tokens for ~1 step's
    HBM traffic (PERF.md "speculative decoding" for measured bounds).

    Cache layout: every round writes its k+1 fresh K/V at a uniform scalar
    offset and carries an explicit per-row validity BITMASK (rejected-draft
    entries stay invalid), so per-row acceptance can diverge without
    per-row write offsets. The cache is sized L + max_new·(k+1) — the α→0
    worst case; callers bucket max_new accordingly.

    ``draft_override`` (B, max_new) replaces the n-gram proposer with a
    fixed token stream — the α=1 measurement harness (and tests).

    Returns (tokens (B, max_new) int32 eos-padded, lengths (B,),
    n_rounds scalar — verification forwards executed; the per-round cost
    vs a plain decode step is the whole economics of the method).
    """
    # ``num_steps``: traced emission cap <= max_new_tokens (the STATIC
    # buffer/bucket size) — callers bucket max_new for compile reuse but a
    # 10-token request must not pay bucket-many verification rounds
    cap = jnp.int32(max_new_tokens if num_steps is None else num_steps)
    B, L, _ = inputs_embeds.shape
    S = L + max_new_tokens * (k + 1)
    cache = init_kv_cache(cfg, B, S, dtype=cache_dtype)
    out = llama_forward(
        params, cfg, inputs_embeds=inputs_embeds, attn_mask=attn_mask,
        kv_cache=cache, cache_offset=jnp.int32(0), last_logit_only=True,
    )
    first = jnp.argmax(out.logits[:, -1], axis=-1).astype(jnp.int32)
    lens = jnp.sum(attn_mask.astype(jnp.int32), axis=1)
    pad_lens = (L - lens).astype(jnp.int32)
    slot = jnp.arange(S, dtype=jnp.int32)[None, :]
    kv_valid0 = (slot >= pad_lens[:, None]) & (slot < L)

    tokens0 = jnp.full((B, max_new_tokens), eos_id, jnp.int32).at[:, 0].set(first)

    # carry: (n_emitted (B,), write_offset scalar, tokens, last (B,),
    #         done (B,), cache, kv_valid, positions (B,) next logical pos)
    state = (
        jnp.ones((B,), jnp.int32),
        jnp.int32(L),
        tokens0,
        first,
        first == eos_id,
        out.kv_cache,
        kv_valid0,
        lens,  # logical position of the NEXT token per row
    )

    def cond_fn(s):
        n, _, _, _, done, *_ = s
        live = ~done & (n < cap)
        return jnp.any(live)

    def body(s):
        n, off, tokens, last, done, cache, kv_valid, pos = s
        if draft_override is None:
            draft = _ngram_propose(tokens, n, last, k)  # (B, k)
        else:
            cols = jnp.clip(n[:, None] + jnp.arange(k)[None, :], 0, max_new_tokens - 1)
            draft = jnp.take_along_axis(draft_override, cols, axis=1)
        seq = jnp.concatenate([last[:, None], draft], axis=1)  # (B, k+1)
        positions = pos[:, None] + jnp.arange(k + 1, dtype=jnp.int32)[None, :]
        fwd = llama_forward(
            params, cfg, input_ids=seq,
            attn_mask=jnp.ones((B, k + 1), bool),
            positions=positions,
            kv_cache=cache, cache_offset=off, kv_valid=kv_valid,
        )
        preds = jnp.argmax(fwd.logits, axis=-1).astype(jnp.int32)  # (B, k+1)
        live = (~done)[:, None]
        tokens, n_add, last, done, commit = commit_verified_drafts(
            preds, draft, tokens, n, cap, done, last, eos_id
        )
        n_new = n + n_add
        # the fresh K/V of the fed tokens [last, draft]: slots are valid for
        # the fed positions that were CONSUMED — last is always consumed by
        # live rows; draft j is consumed iff committed as context, i.e.
        # j < n_add (the verified prefix feeds future attention)
        j = jnp.arange(k + 1, dtype=jnp.int32)[None, :]
        fed_ok = (j < jnp.maximum(n_add, 1)[:, None]) & live
        kv_valid = jax.lax.dynamic_update_slice(
            kv_valid, fed_ok, (0, off)
        )
        pos = pos + n_add
        return (n_new, off + k + 1, tokens, last, done, fwd.kv_cache, kv_valid, pos)

    n, off, tokens, _, done, _, _, _ = jax.lax.while_loop(cond_fn, body, state)
    n_rounds = (off - L) // (k + 1)
    return tokens, jnp.minimum(n, cap), n_rounds


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
