"""Generate the committed golden fixtures under tests/goldens/.

Goldens freeze the externally-observable contracts of the prompt/splice/
generate pipeline (VERDICT r1 #10) so a weights-available environment can
verify parity with the reference immediately — without reading code:

  prompt_templates.json        exact chat-template strings (must be
                               byte-identical to reference/utils.py:6-10)
  prompt_ids_byte_tokenizer.json   template token ids under ByteTokenizer
                               (the zero-egress fallback tokenizer). With
                               the real HF tokenizer available, regenerate
                               with --tokenizer <hf-name> and the file is
                               keyed by that tokenizer's name instead.
  audio_embed_lengths.json     compute_num_audio_embeds sweep
                               (reference: utils.py:13-24)
  splice_layout_llama3.json    full-size llama3_hubert splice layout:
                               token id at every position (-1 = audio
                               embedding, -100 = pad), labels, masks
                               (reference: utils.py:76-164 semantics)
  generate_tokens_tiny.json    seeded greedy token stream on the tiny
                               model (regression fixture for the jitted
                               prefill+decode path)

Regenerate:  python scripts/make_goldens.py   (writes tests/goldens/)
Verify:      python -m pytest tests/test_goldens.py -q
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

# goldens must be backend-independent: generate on CPU (f32 there is true
# f32; the axon TPU backend's f32 default is low-precision — CLAUDE.md)
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "..", "tests", "goldens")

LLM_TYPES = ["meta-llama/Llama-3.2-3B-Instruct", "GeneZC/MiniChat-2-3B"]


def write(name: str, obj) -> None:
    path = os.path.join(GOLDEN_DIR, name)
    with open(path, "w") as f:
        json.dump(obj, f, indent=1, sort_keys=True)
        f.write("\n")
    print(f"wrote {path}")


def golden_templates():
    from llm_speech_summarization_tpu.utils.prompts import prompt_template_for

    out = {}
    for t in LLM_TYPES:
        tpl = prompt_template_for(t)
        out[t] = {"prefix": tpl.prefix, "suffix": tpl.suffix}
    write("prompt_templates.json", out)
    return out


def golden_prompt_ids(tokenizer_name: str | None):
    if tokenizer_name:
        from transformers import AutoTokenizer

        tok = AutoTokenizer.from_pretrained(tokenizer_name)
        key = tokenizer_name

        def enc(s, add_bos):
            ids = tok(s).input_ids
            return ids if add_bos else [i for i in ids if i != tok.bos_token_id][
                : len(ids)
            ]
    else:
        from llm_speech_summarization_tpu.utils.tokenizer import ByteTokenizer

        tok = ByteTokenizer()
        key = "ByteTokenizer"

        def enc(s, add_bos):
            return list(map(int, tok.encode(s, add_bos=add_bos)))

    from llm_speech_summarization_tpu.utils.prompts import prompt_template_for

    out = {"tokenizer": key, "prompts": {}}
    for t in LLM_TYPES:
        tpl = prompt_template_for(t)
        out["prompts"][t] = {
            "prefix_ids_with_bos": enc(tpl.prefix, True),
            "suffix_ids": enc(tpl.suffix, False),
        }
    write("prompt_ids_byte_tokenizer.json", out)


def golden_audio_lengths():
    from llm_speech_summarization_tpu.utils.prompts import compute_num_audio_embeds

    sweep = [16000, 24000, 32000, 48000, 80000, 160000, 240000, 320000]
    out = {
        str(f): {str(n): compute_num_audio_embeds(n, downsample_factor=f) for n in sweep}
        for f in (2, 4, 8)
    }
    write("audio_embed_lengths.json", out)


def golden_splice_layout():
    """Full-size llama3_hubert dims, ByteTokenizer templates. The embedding
    table is (V, 1) with table[i] = i and audio embeds are -1, so the spliced
    embeds' single channel IS the per-position token id / sentinel map."""
    import jax.numpy as jnp

    from llm_speech_summarization_tpu.configs import load_config
    from llm_speech_summarization_tpu.ops.splice import splice_sequences
    from llm_speech_summarization_tpu.utils.prompts import (
        compute_num_audio_embeds,
        prompt_template_for,
    )
    from llm_speech_summarization_tpu.utils.tokenizer import ByteTokenizer

    cfg = load_config("llm_speech_summarization_tpu/configs/yaml/llama3_hubert.yaml")
    tok = ByteTokenizer()
    tpl = prompt_template_for(cfg.model.llm_type)
    prefix = tok.encode(tpl.prefix, add_bos=True)
    suffix = tok.encode(tpl.suffix, add_bos=False)

    V = 128256  # llama3 vocab (id-map table, content irrelevant)
    table = jnp.arange(V, dtype=jnp.float32)[:, None]

    # two samples: 10 s and 4.3 s audio, different response lengths
    audio_samples = [160000, 68800]
    mids = [compute_num_audio_embeds(n, downsample_factor=4) for n in audio_samples]
    M = max(mids)
    rng = np.random.RandomState(0)
    mid_embeds = -jnp.ones((2, M, 1), jnp.float32)
    mid_lens = jnp.asarray(mids, jnp.int32)
    resp = [
        list(map(int, rng.randint(1, 255, size=17))),
        list(map(int, rng.randint(1, 255, size=5))),
    ]
    R = max(len(r) for r in resp)
    resp_ids = np.zeros((2, R), np.int32)
    for b, r in enumerate(resp):
        resp_ids[b, : len(r)] = r
    resp_lens = jnp.asarray([len(r) for r in resp], jnp.int32)

    total_len = len(prefix) + M + len(suffix) + R
    total_len = ((total_len + 127) // 128) * 128

    s = splice_sequences(
        table,
        jnp.asarray(prefix, jnp.int32),
        jnp.asarray(suffix, jnp.int32),
        mid_embeds,
        mid_lens,
        jnp.asarray(resp_ids),
        resp_lens,
        total_len=total_len,
    )
    layout = np.asarray(s.embeds[:, :, 0]).astype(np.int64)
    layout[~np.asarray(s.attn_mask)] = -100  # pad sentinel

    write(
        "splice_layout_llama3.json",
        {
            "config": "llama3_hubert.yaml",
            "tokenizer": "ByteTokenizer",
            "audio_samples": audio_samples,
            "num_audio_embeds": mids,
            "response_ids": resp,
            "total_len": int(total_len),
            "legend": "layout: token id per position; -1 audio embed; -100 pad",
            "layout": layout.tolist(),
            "labels": np.asarray(s.labels).tolist(),
            "loss_mask": np.asarray(s.loss_mask).astype(int).tolist(),
            "response_mask": np.asarray(s.response_mask).astype(int).tolist(),
            "seq_lens": np.asarray(s.seq_lens).tolist(),
        },
    )


def golden_generate_tokens():
    import jax
    import jax.numpy as jnp

    from llm_speech_summarization_tpu.infer.generate import greedy_generate
    from llm_speech_summarization_tpu.models.llama import (
        init_llama_params,
        llama_preset,
    )

    cfg = llama_preset("tiny")
    params = init_llama_params(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
    table = params["embed_tokens"]
    rng = np.random.RandomState(42)
    ids = rng.randint(1, cfg.vocab_size, size=(2, 16))
    embeds = table[jnp.asarray(ids)]
    mask = jnp.ones((2, 16), bool)
    toks, lens = greedy_generate(
        params, cfg, embeds, mask, max_new_tokens=12, eos_id=0,
        cache_dtype=jnp.float32,
    )
    write(
        "generate_tokens_tiny.json",
        {
            "llm_preset": "tiny",
            "param_seed": 0,
            "param_dtype": "float32",
            "prompt_ids": ids.tolist(),
            "max_new_tokens": 12,
            "eos_id": 0,
            "tokens": np.asarray(toks).tolist(),
            "lengths": np.asarray(lens).tolist(),
        },
    )


def golden_sampled_tokens():
    """Seeded per-request sampling stream (VERDICT r4 #6): pins the
    infer/sampling.py counter-hash sampler — the murmur3 (seed, position)
    draw sequence, the 64-candidate inverse-CDF pick, per-row temperature/
    top-k/top-p, and greedy-row exactness inside a mixed batch — as one
    committed fixture. Draws key to the row's UNPADDED position, so the
    fixture includes a left-padded row; test_goldens.py replays it alone
    (different batch, no padding) and asserts the identical stream."""
    import jax
    import jax.numpy as jnp

    from llm_speech_summarization_tpu.infer.generate import greedy_generate
    from llm_speech_summarization_tpu.infer.sampling import pack_sampling_params
    from llm_speech_summarization_tpu.models.llama import (
        init_llama_params,
        llama_preset,
    )

    cfg = llama_preset("tiny")
    params = init_llama_params(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
    table = params["embed_tokens"]
    rng = np.random.RandomState(7)
    L = 16
    ids = rng.randint(1, cfg.vocab_size, size=(4, L))
    mask = np.ones((4, L), bool)
    mask[1, :5] = False  # left-padded row: draws must ignore the padding
    ids[1, :5] = 0
    # (temperature, top_k, top_p, seed) per row; None = greedy
    spec = [None, (0.9, 0, 1.0, 1234), (1.3, 8, 1.0, 42), (0.8, 0, 0.9, 7)]
    packed = pack_sampling_params(spec, 4)
    toks, lens = greedy_generate(
        params, cfg, table[jnp.asarray(ids)], jnp.asarray(mask),
        max_new_tokens=12, eos_id=0, cache_dtype=jnp.float32,
        sampling=tuple(jnp.asarray(a) for a in packed),
    )
    write(
        "sampled_tokens_tiny.json",
        {
            "llm_preset": "tiny",
            "param_seed": 0,
            "param_dtype": "float32",
            "prompt_ids": ids.tolist(),
            "prompt_mask": mask.astype(int).tolist(),
            "sampling": [list(s) if s else None for s in spec],
            "max_new_tokens": 12,
            "eos_id": 0,
            "tokens": np.asarray(toks).tolist(),
            "lengths": np.asarray(lens).tolist(),
        },
    )


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--tokenizer", default=None,
                   help="HF tokenizer name for real-tokenizer prompt ids "
                   "(weights-available environments)")
    args = p.parse_args()
    os.makedirs(GOLDEN_DIR, exist_ok=True)
    golden_templates()
    golden_prompt_ids(args.tokenizer)
    golden_audio_lengths()
    golden_splice_layout()
    golden_generate_tokens()
    golden_sampled_tokens()


if __name__ == "__main__":
    main()
