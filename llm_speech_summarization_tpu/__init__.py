"""llm_speech_summarization_tpu — a TPU-native speech-as-prompt LLM framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of
wonjune-kang/llm-speech-summarization (Interspeech 2024, "Prompting Large
Language Models with Audio for General-Purpose Speech Summarization"):
a trainable audio encoder (HuBERT / Whisper-encoder) that maps 16 kHz speech
into the token-embedding space of a frozen decoder-only LLM, trained with
next-token-prediction + logit-distillation + feature-distillation losses
against the same LLM run on the ground-truth transcript.

Unlike the reference (single GPU, batch size 1, PyTorch), everything here is
designed TPU-first: static shapes, batched masked losses instead of
per-sample Python loops, a single jitted train step over a
``jax.sharding.Mesh``, Pallas kernels for the hot attention / pooling paths,
and an inference engine with a jitted prefill + KV-cache decode loop.

Package layout:
  configs/   typed config schema + YAML presets (reference: config/*.yaml)
  utils/     prompt templates, splicing math, tokenizers (reference: utils.py)
  ops/       pure array ops: norms, rope, attention, splice, losses, pooling
  kernels/   Pallas TPU kernels (flash attention, segment mean, ...)
  models/    Llama-family decoder, HuBERT/Whisper encoders, projector
  parallel/  mesh construction + sharding rules (absent in the reference)
  data/      synthetic + preprocessed-dataset input pipeline, collation
  train/     train state, jitted KD train step, trainer loop, checkpointing
  infer/     KV cache, prefill/decode, LLMSpeechTextInference engine
  obs/       metrics writers (tensorboard + JSONL), profiling helpers
"""

__version__ = "0.1.0"
