"""Checkpoint conversion CLI: local HF checkpoints → framework Orbax format.

The reference downloads HF weights at runtime (reference: trainer.py:58-64,
inference.py:46-52); here conversion is a one-time offline step producing
Orbax checkpoints that the engine/trainer load via config paths.

Usage:
  # frozen LLM (LlamaForCausalLM layout)
  python -m llm_speech_summarization_tpu.cli.convert llm \
      --hf_dir /path/to/Llama-3.2-3B-Instruct --preset llama3_3b \
      --output ckpts/llama3_3b

  # audio encoder backbone (HubertModel / WhisperModel layout)
  python -m llm_speech_summarization_tpu.cli.convert encoder \
      -c <yaml> --hf_dir /path/to/hubert-large-ls960-ft --output ckpts/hubert
"""

from __future__ import annotations

import argparse


def main(argv=None):
    from ..utils.compile_cache import enable_compilation_cache

    enable_compilation_cache()
    parser = argparse.ArgumentParser()
    parser.add_argument("kind", choices=["llm", "encoder", "ctc"])
    parser.add_argument("--hf_dir", type=str, required=True,
                        help="local HF checkpoint dir (safetensors or .bin)")
    parser.add_argument("--output", type=str, required=True)
    parser.add_argument("--preset", type=str, default=None,
                        help="llm preset name (llm kind) or HuBERT preset "
                        "(ctc kind; default hubert_large)")
    parser.add_argument("-c", "--config", type=str, default=None,
                        help="framework yaml (encoder kind)")
    parser.add_argument("--dtype", type=str, default="bfloat16")
    args = parser.parse_args(argv)

    import jax.numpy as jnp
    import orbax.checkpoint as ocp

    from ..models.convert import (
        convert_hubert,
        convert_hubert_ctc,
        convert_llama,
        convert_whisper_encoder,
        load_hf_state_dict,
    )

    sd = load_hf_state_dict(args.hf_dir)
    dtype = jnp.dtype(args.dtype)

    if args.kind == "llm":
        from ..models.llama import llama_preset

        if not args.preset:
            parser.error("--preset required for llm conversion")
        cfg = llama_preset(args.preset)
        params = convert_llama(sd, cfg, dtype)
        payload = {"llm_params": params}
    elif args.kind == "ctc":
        # HF HubertForCTC (facebook/hubert-large-ls960-ft) → the word-offset
        # model the preprocess CLI's --ctc flag consumes
        # (reference: preprocess_data/utils.py:127-152)
        from ..models.hubert import hubert_preset

        cfg = hubert_preset(args.preset or "hubert_large")
        enc, head = convert_hubert_ctc(sd, cfg, dtype)
        payload = {"enc_params": enc, "head_params": head}
    else:
        from ..configs import load_config
        from ..models.audio_encoder import encoder_setup_from_config, init_audio_encoder

        if not args.config:
            parser.error("--config required for encoder conversion")
        fw_cfg = load_config(args.config)
        setup = encoder_setup_from_config(fw_cfg)
        if setup.base == "hubert":
            enc = convert_hubert(sd, setup.encoder_cfg, dtype)
        else:
            enc = convert_whisper_encoder(sd, setup.encoder_cfg, dtype)
        # projector starts random (it is the trainable part); package the
        # converted backbone inside a full encoder param tree
        import jax

        full = init_audio_encoder(jax.random.PRNGKey(0), setup, dtype)
        full["encoder"] = enc
        payload = {"enc_params": full}

    import os

    ckptr = ocp.StandardCheckpointer()
    ckptr.save(os.path.abspath(args.output), payload, force=True)
    ckptr.wait_until_finished()
    print(f"wrote {args.kind} checkpoint to {args.output}")


if __name__ == "__main__":
    main()
