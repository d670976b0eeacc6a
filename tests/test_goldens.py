"""Verify the committed golden fixtures (tests/goldens/) against the code.

The goldens freeze externally-observable contracts — template strings,
prompt token ids, the audio-length calculus, the full-size splice layout,
and a seeded greedy token stream — so any environment (in particular a
weights-available one) can check parity without reading code. Regenerate
with scripts/make_goldens.py after an INTENTIONAL contract change.
"""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "goldens")


def load(name):
    with open(os.path.join(GOLDEN_DIR, name)) as f:
        return json.load(f)


def test_prompt_template_goldens():
    from llm_speech_summarization_tpu.utils.prompts import prompt_template_for

    g = load("prompt_templates.json")
    for llm_type, tpl in g.items():
        have = prompt_template_for(llm_type)
        assert have.prefix == tpl["prefix"], llm_type
        assert have.suffix == tpl["suffix"], llm_type


def test_prompt_ids_goldens():
    from llm_speech_summarization_tpu.utils.prompts import prompt_template_for
    from llm_speech_summarization_tpu.utils.tokenizer import ByteTokenizer

    g = load("prompt_ids_byte_tokenizer.json")
    if g["tokenizer"] != "ByteTokenizer":  # regenerated with a real tokenizer
        import pytest

        pytest.skip("goldens were generated with a real HF tokenizer")
    tok = ByteTokenizer()
    for llm_type, ids in g["prompts"].items():
        tpl = prompt_template_for(llm_type)
        assert list(map(int, tok.encode(tpl.prefix, add_bos=True))) == ids[
            "prefix_ids_with_bos"
        ]
        assert list(map(int, tok.encode(tpl.suffix, add_bos=False))) == ids["suffix_ids"]


def test_audio_embed_length_goldens():
    from llm_speech_summarization_tpu.utils.prompts import compute_num_audio_embeds

    g = load("audio_embed_lengths.json")
    for factor, table in g.items():
        for samples, count in table.items():
            assert compute_num_audio_embeds(int(samples), downsample_factor=int(factor)) == count


def test_splice_layout_golden():
    """Re-splice the golden's inputs and compare every layout artifact."""
    from llm_speech_summarization_tpu.ops.splice import splice_sequences
    from llm_speech_summarization_tpu.utils.prompts import prompt_template_for
    from llm_speech_summarization_tpu.utils.tokenizer import ByteTokenizer

    g = load("splice_layout_llama3.json")
    tok = ByteTokenizer()
    tpl = prompt_template_for("meta-llama/Llama-3.2-3B-Instruct")
    prefix = tok.encode(tpl.prefix, add_bos=True)
    suffix = tok.encode(tpl.suffix, add_bos=False)

    table = jnp.arange(128256, dtype=jnp.float32)[:, None]
    mids = g["num_audio_embeds"]
    M = max(mids)
    mid_embeds = -jnp.ones((2, M, 1), jnp.float32)
    resp = g["response_ids"]
    R = max(len(r) for r in resp)
    resp_ids = np.zeros((2, R), np.int32)
    for b, r in enumerate(resp):
        resp_ids[b, : len(r)] = r

    s = splice_sequences(
        table,
        jnp.asarray(prefix, jnp.int32),
        jnp.asarray(suffix, jnp.int32),
        mid_embeds,
        jnp.asarray(mids, jnp.int32),
        jnp.asarray(resp_ids),
        jnp.asarray([len(r) for r in resp], jnp.int32),
        total_len=g["total_len"],
    )
    layout = np.asarray(s.embeds[:, :, 0]).astype(np.int64)
    layout[~np.asarray(s.attn_mask)] = -100
    assert layout.tolist() == g["layout"]
    assert np.asarray(s.labels).tolist() == g["labels"]
    assert np.asarray(s.loss_mask).astype(int).tolist() == g["loss_mask"]
    assert np.asarray(s.response_mask).astype(int).tolist() == g["response_mask"]
    assert np.asarray(s.seq_lens).tolist() == g["seq_lens"]


def test_generate_tokens_golden():
    from llm_speech_summarization_tpu.infer.generate import greedy_generate
    from llm_speech_summarization_tpu.models.llama import (
        init_llama_params,
        llama_preset,
    )

    g = load("generate_tokens_tiny.json")
    cfg = llama_preset(g["llm_preset"])
    params = init_llama_params(jax.random.PRNGKey(g["param_seed"]), cfg, dtype=jnp.float32)
    embeds = params["embed_tokens"][jnp.asarray(g["prompt_ids"], jnp.int32)]
    mask = jnp.ones((len(g["prompt_ids"]), len(g["prompt_ids"][0])), bool)
    toks, lens = greedy_generate(
        params, cfg, embeds, mask,
        max_new_tokens=g["max_new_tokens"], eos_id=g["eos_id"],
        cache_dtype=jnp.float32,
    )
    assert np.asarray(toks).tolist() == g["tokens"]
    assert np.asarray(lens).tolist() == g["lengths"]


def _sampled_golden_run(g, rows):
    """Replay a subset of the sampled-tokens golden's rows: each row keeps
    its own UNPADDED prompt (padding stripped), whatever batch it lands in."""
    from llm_speech_summarization_tpu.infer.generate import greedy_generate
    from llm_speech_summarization_tpu.infer.sampling import pack_sampling_params
    from llm_speech_summarization_tpu.models.llama import (
        init_llama_params,
        llama_preset,
    )

    cfg = llama_preset(g["llm_preset"])
    params = init_llama_params(
        jax.random.PRNGKey(g["param_seed"]), cfg, dtype=jnp.float32
    )
    ids = np.asarray(g["prompt_ids"])[rows]
    mask = np.asarray(g["prompt_mask"])[rows].astype(bool)
    spec = [tuple(g["sampling"][r]) if g["sampling"][r] else None for r in rows]
    packed = pack_sampling_params(spec, len(rows))
    sampling = (
        None if packed is None else tuple(jnp.asarray(a) for a in packed)
    )
    toks, lens = greedy_generate(
        params, cfg, params["embed_tokens"][jnp.asarray(ids)],
        jnp.asarray(mask), max_new_tokens=g["max_new_tokens"],
        eos_id=g["eos_id"], cache_dtype=jnp.float32, sampling=sampling,
    )
    return np.asarray(toks).tolist(), np.asarray(lens).tolist()


def test_sampled_tokens_golden():
    """Seeded per-request sampling stream (VERDICT r4 #6): the committed
    fixture pins the counter-hash sampler's draw sequence, the candidate-
    window inverse-CDF pick, and greedy-row exactness in a mixed batch."""
    g = load("sampled_tokens_tiny.json")
    toks, lens = _sampled_golden_run(g, rows=[0, 1, 2, 3])
    assert toks == g["tokens"]
    assert lens == g["lengths"]


def test_sampled_tokens_replay_invariant():
    """A seeded request replays bit-identically in ANY batch composition:
    the golden's left-padded sampling row, run ALONE with its padding
    stripped, must emit the exact committed stream (draws key to the row's
    unpadded position, not the batch/bucket layout)."""
    g = load("sampled_tokens_tiny.json")
    pad = sum(1 for m in g["prompt_mask"][1] if not m)
    ids = [g["prompt_ids"][1][pad:]]
    from llm_speech_summarization_tpu.infer.generate import greedy_generate
    from llm_speech_summarization_tpu.infer.sampling import pack_sampling_params
    from llm_speech_summarization_tpu.models.llama import (
        init_llama_params,
        llama_preset,
    )

    cfg = llama_preset(g["llm_preset"])
    params = init_llama_params(
        jax.random.PRNGKey(g["param_seed"]), cfg, dtype=jnp.float32
    )
    packed = pack_sampling_params([tuple(g["sampling"][1])], 1)
    toks, _ = greedy_generate(
        params, cfg, params["embed_tokens"][jnp.asarray(ids, jnp.int32)],
        jnp.ones((1, len(ids[0])), bool),
        max_new_tokens=g["max_new_tokens"], eos_id=g["eos_id"],
        cache_dtype=jnp.float32,
        sampling=tuple(jnp.asarray(a) for a in packed),
    )
    assert np.asarray(toks)[0].tolist() == g["tokens"][1]
