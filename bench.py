"""Benchmark: batched audio-prompt inference throughput on one TPU chip.

Measures the product path (reference: inference.py:95-137): waveform →
HuBERT-large → pool projector → [prefix|audio|suffix] splice → Llama-3.2-3B
prefill + KV-cache greedy decode of 64 tokens, batched over 128 utterances of
10 s each. Random-init weights (no egress in this environment); throughput
is weight-independent.

Baseline note: the reference publishes NO numbers (BASELINE.md). The
vs_baseline denominator is a documented estimate of the reference's
single-GPU (A100, fp16, bs=1, HF eager generate) rate on the same
workload: ~35 tok/s decode → ~1.9 s/utterance → ~0.53 utt/s.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

from __future__ import annotations

import json
import time

import numpy as np

BASELINE_UTT_PER_S = 0.53  # documented estimate, see module docstring

BATCH = 128
AUDIO_SECONDS = 10.0
MAX_NEW_TOKENS = 64
ROUNDS = 3


def main():
    import jax

    from llm_speech_summarization_tpu.configs import load_config
    from llm_speech_summarization_tpu.infer.engine import LLMSpeechTextInference

    cfg = load_config("llm_speech_summarization_tpu/configs/yaml/llama3_hubert.yaml")
    engine = LLMSpeechTextInference(cfg)

    rng = np.random.RandomState(0)
    sr = cfg.audio.sampling_rate
    audios = [
        (0.1 * rng.randn(int(AUDIO_SECONDS * sr))).astype(np.float32) for _ in range(BATCH)
    ]

    # warmup (compile)
    engine.generate_audio_response_batch(audios, max_new_tokens=MAX_NEW_TOKENS)

    times = []
    for _ in range(ROUNDS):
        t0 = time.perf_counter()
        engine.generate_audio_response_batch(audios, max_new_tokens=MAX_NEW_TOKENS)
        times.append(time.perf_counter() - t0)

    best = min(times)
    utt_per_s = BATCH / best
    print(
        json.dumps(
            {
                "metric": "audio_prompt_utterances_per_s_per_chip",
                "value": round(utt_per_s, 3),
                "unit": "utt/s",
                "vs_baseline": round(utt_per_s / BASELINE_UTT_PER_S, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
