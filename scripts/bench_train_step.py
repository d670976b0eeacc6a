"""Full-size KD train-step timing on the real chip (PERF.md training row).

Llama-3.2-3B (frozen, bf16) + HuBERT-large encoder, synthetic batch,
B=8, spliced seq 512 — the round-1 configuration measured at 1.52 s/step
(~18% MFU). Flags: --no-remat to measure without rematerialization.
"""

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, ".")
from llm_speech_summarization_tpu.utils.compile_cache import enable_compilation_cache

enable_compilation_cache()

from llm_speech_summarization_tpu.configs import load_config
from llm_speech_summarization_tpu.data import SyntheticSpeechDataset, collate_batch
from llm_speech_summarization_tpu.models.audio_encoder import (
    encoder_setup_from_config,
    init_audio_encoder,
)
from llm_speech_summarization_tpu.models.llama import init_llama_params, llama_preset
from llm_speech_summarization_tpu.train import make_train_state, make_train_step
from llm_speech_summarization_tpu.utils.prompts import prompt_template_for
from llm_speech_summarization_tpu.utils.tokenizer import ByteTokenizer

B = 8
STEPS = 5


def main():
    global B
    remat = "--no-remat" not in sys.argv
    for a in sys.argv:  # --batch=16: int8 LLM frees ~3.2 GB — measure it
        if a.startswith("--batch="):
            B = int(a.split("=")[1])
    cfg = load_config("llm_speech_summarization_tpu/configs/yaml/llama3_hubert.yaml")
    cfg.train.batch_size = B
    cfg.train.remat = remat
    for a in sys.argv:  # --policy=save_qkv | full (selective remat)
        if a.startswith("--policy="):
            cfg.train.remat_policy = a.split("=")[1]

    llm_cfg = llama_preset(cfg.model.llm_preset or cfg.model.llm_type)
    enc_setup = encoder_setup_from_config(cfg)
    llm_params = init_llama_params(jax.random.PRNGKey(0), llm_cfg, dtype=jnp.bfloat16)
    if "--int8" in sys.argv:  # weight-only int8 frozen LLM (train path)
        from llm_speech_summarization_tpu.models.llama import quantize_llama_params

        llm_params = quantize_llama_params(llm_params)
    enc_params = init_audio_encoder(jax.random.PRNGKey(1), enc_setup, dtype=jnp.float32)

    tok = ByteTokenizer()
    tpl = prompt_template_for(cfg.model.llm_type)
    prefix = jnp.asarray(tok.encode(tpl.prefix, add_bos=True), jnp.int32)
    suffix = jnp.asarray(tok.encode(tpl.suffix, add_bos=False), jnp.int32)

    sec = 2.5
    for a in sys.argv:
        if a.startswith("--seconds="):
            sec = float(a.split("=")[1])
    ds = SyntheticSpeechDataset(tok, num_samples=B, max_seconds=sec)
    batch = collate_batch(
        [ds[i] for i in range(B)],
        audio_buckets=cfg.train.buckets.audio_samples,
        max_text_tokens=cfg.train.buckets.max_text_tokens,
        max_response_tokens=cfg.train.buckets.max_response_tokens,
    )

    from llm_speech_summarization_tpu.models.audio_encoder import audio_encoder_forward

    out, _ = jax.eval_shape(
        lambda p, w, l: audio_encoder_forward(p, enc_setup, w, l),
        enc_params,
        jax.ShapeDtypeStruct(batch.wav.shape, jnp.float32),
        jax.ShapeDtypeStruct(batch.wav_lens.shape, jnp.int32),
    )
    P, S = prefix.shape[0], suffix.shape[0]
    need = P + max(out.shape[1], cfg.train.buckets.max_text_tokens) + S + (
        cfg.train.buckets.max_response_tokens
    )
    total_len = ((need + 127) // 128) * 128  # flash fwd/bwd need T % 128 == 0

    state, tx = make_train_state(cfg, enc_params, total_opt_steps=100)
    step = make_train_step(
        cfg, enc_setup, llm_cfg, tx, prefix, suffix, total_len, donate=True
    )

    state, metrics = step(state, llm_params, batch)
    print(f"compiled: total_len={total_len} remat={remat} "
          f"loss={float(metrics['total_loss']):.4f}", flush=True)
    t0 = time.perf_counter()
    for _ in range(STEPS):
        state, metrics = step(state, llm_params, batch)
    _ = float(metrics["total_loss"])  # host sync
    dt = (time.perf_counter() - t0) / STEPS
    print(f"train step: {dt:.3f} s/step = {B / dt:.2f} samples/s", flush=True)


if __name__ == "__main__":
    main()
