"""Real-weights parity checks — ACTIVE ONLY in a weights-available
environment (scripts/verify_weights.sh step 4 sets the env vars; in the
zero-egress CI these tests skip).

With LSS_HF_LLAMA_DIR / LSS_HF_HUBERT_DIR pointing at local HF
checkpoints, each test converts the real weights (models/convert.py) and
compares a forward pass against the transformers implementation — the
strongest available evidence that converted weights reproduce the
reference's frozen teacher (reference: trainer.py:58-64) before spending
GPU/TPU-hours on the quality table.
"""

import os

import numpy as np
import pytest

LLAMA_DIR = os.environ.get("LSS_HF_LLAMA_DIR", "")
HUBERT_DIR = os.environ.get("LSS_HF_HUBERT_DIR", "")

needs_llama = pytest.mark.skipif(
    not (LLAMA_DIR and os.path.isdir(LLAMA_DIR)),
    reason="set LSS_HF_LLAMA_DIR to a local Llama-3.2-3B-Instruct checkout",
)
needs_hubert = pytest.mark.skipif(
    not (HUBERT_DIR and os.path.isdir(HUBERT_DIR)),
    reason="set LSS_HF_HUBERT_DIR to a local hubert-large-ls960-ft checkout",
)


@needs_llama
def test_real_llama_logits_match_transformers():
    import jax.numpy as jnp
    import torch
    from transformers import AutoModelForCausalLM, AutoTokenizer

    from llm_speech_summarization_tpu.models.convert import (
        convert_llama,
        load_hf_state_dict,
    )
    from llm_speech_summarization_tpu.models.llama import llama_forward, llama_preset

    cfg = llama_preset("llama3_3b")
    params = convert_llama(load_hf_state_dict(LLAMA_DIR), cfg, dtype=jnp.float32)

    tok = AutoTokenizer.from_pretrained(LLAMA_DIR)
    ids = tok("The quick brown fox jumps over", return_tensors="pt").input_ids
    with torch.no_grad():
        hf = AutoModelForCausalLM.from_pretrained(LLAMA_DIR, torch_dtype=torch.float32)
        ref = hf(ids).logits[0].numpy()

    out = llama_forward(params, cfg, input_ids=jnp.asarray(ids.numpy()))
    got = np.asarray(out.logits[0], np.float32)
    # greedy argmax must agree everywhere; logits bf16-level close
    np.testing.assert_array_equal(got.argmax(-1), ref.argmax(-1))
    np.testing.assert_allclose(got, ref, rtol=2e-2, atol=2e-2)


@needs_hubert
def test_real_hubert_frames_match_transformers():
    import jax.numpy as jnp
    import torch
    from transformers import AutoModel

    from llm_speech_summarization_tpu.models.convert import (
        convert_hubert,
        load_hf_state_dict,
    )
    from llm_speech_summarization_tpu.models.hubert import hubert_forward, hubert_preset

    cfg = hubert_preset("hubert_large")
    params = convert_hubert(load_hf_state_dict(HUBERT_DIR), cfg, dtype=jnp.float32)

    rng = np.random.RandomState(0)
    wav = (0.1 * rng.randn(1, 32000)).astype(np.float32)
    with torch.no_grad():
        hf = AutoModel.from_pretrained(HUBERT_DIR, torch_dtype=torch.float32)
        ref = hf(torch.from_numpy(wav)).last_hidden_state[0].numpy()

    frames, _ = hubert_forward(params, cfg, jnp.asarray(wav))
    got = np.asarray(frames[0], np.float32)
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, rtol=2e-3, atol=2e-3)
