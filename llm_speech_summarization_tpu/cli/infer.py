"""Inference CLI.

Flag parity with the reference entrypoint (reference: inference.py:140-178):
  -c/--config, -p/--audio_encoder_checkpoint, -a/--audio_file,
  plus --text for the interleaved additional_text_prompt path and
  --max_new_tokens (reference hardcodes 512, inference.py:174).

Usage: python -m llm_speech_summarization_tpu.cli.infer -c <yaml> -a <wav>
"""

from __future__ import annotations

import argparse


def main(argv=None):
    from ..utils.compile_cache import enable_compilation_cache

    enable_compilation_cache()
    parser = argparse.ArgumentParser()
    parser.add_argument("-c", "--config", type=str, required=True,
                        help="yaml file for configuration")
    parser.add_argument("-p", "--audio_encoder_checkpoint", type=str, default=None,
                        help="path to audio encoder checkpoint (Orbax export)")
    parser.add_argument("-a", "--audio_file", type=str, required=True,
                        help="audio file containing speech utterance to be used in prompt")
    parser.add_argument("--text", type=str, default="",
                        help="additional text prompt placed before the audio")
    parser.add_argument("--max_new_tokens", type=int, default=512)
    parser.add_argument("--repetition_penalty", type=float, default=1.0,
                        help="damp repeated tokens (the reference documents "
                        "greedy repetition loops as a known failure, "
                        "inference.py:169-171; try 1.2)")
    parser.add_argument("--speculative_k", type=int, default=0,
                        help="self-speculative decoding lookahead for the "
                        "greedy decode (0 = off; token-exact acceleration, "
                        "PERF.md)")
    args = parser.parse_args(argv)

    from ..configs import load_config
    from ..data.audio_io import load_audio
    from ..infer.engine import LLMSpeechTextInference

    config = load_config(args.config)
    engine = LLMSpeechTextInference(
        config, audio_encoder_checkpoint=args.audio_encoder_checkpoint,
        repetition_penalty=args.repetition_penalty,
        speculative_k=args.speculative_k,
    )

    audio = load_audio(args.audio_file, target_sr=config.audio.sampling_rate)
    response = engine.generate_audio_response(
        audio,
        additional_text_prompt=args.text,
        max_new_tokens=args.max_new_tokens,
    )
    print("LLM Response:\n")
    print(response)


if __name__ == "__main__":
    main()
