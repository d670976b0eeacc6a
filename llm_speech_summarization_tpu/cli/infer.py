"""Inference CLI.

Flag parity with the reference entrypoint (reference: inference.py:140-178):
  -c/--config, -p/--audio_encoder_checkpoint, -a/--audio_file,
  plus --text for the interleaved additional_text_prompt path and
  --max_new_tokens (reference hardcodes 512, inference.py:174).

Usage: python -m llm_speech_summarization_tpu.cli.infer -c <yaml> -a <wav>
Bulk:  ... --audio_dir <dir> --output out.jsonl   (pipelined batches:
       batch i+1's upload+encode overlaps batch i's prefill+decode)
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
    parser.add_argument("-a", "--audio_file", type=str, default=None,
                        help="audio file containing speech utterance to be used in prompt")
    parser.add_argument("--audio_dir", type=str, default=None,
                        help="bulk mode: summarize every .wav/.flac under "
                        "this directory through the pipelined batch stream "
                        "(length-sorted batches of --batch_size)")
    parser.add_argument("--output", type=str, default=None,
                        help="bulk mode: write {file, response} JSONL here "
                        "(default: stdout)")
    parser.add_argument("--batch_size", type=int, default=32,
                        help="bulk mode: utterances per pipelined batch")
    parser.add_argument("--text", type=str, default="",
                        help="additional text prompt placed before the audio")
    parser.add_argument("--max_new_tokens", type=int, default=512)
    parser.add_argument("--repetition_penalty", type=float, default=1.0,
                        help="damp repeated tokens (the reference documents "
                        "greedy repetition loops as a known failure, "
                        "inference.py:169-171; try 1.2)")
    parser.add_argument("--ctc", type=str, default=None,
                        help="HuBERT-CTC checkpoint dir (cli/convert.py ctc) "
                        "— REQUIRED for ctc_pool configs: computes each "
                        "clip's pool ranges on the fly (the stage the "
                        "reference calls through an undefined function, "
                        "inference.py:102)")
    parser.add_argument("--ctc_preset", type=str, default="hubert_large")
    parser.add_argument("--ctc_vocab", type=int, default=32)
    parser.add_argument("--speculative_k", type=int, default=0,
                        help="self-speculative decoding lookahead for the "
                        "greedy decode (0 = off; token-exact acceleration, "
                        "PERF.md)")
    args = parser.parse_args(argv)
    if (args.audio_file is None) == (args.audio_dir is None):
        parser.error("exactly one of -a/--audio_file or --audio_dir is required")

    from ..configs import load_config
    from ..data.audio_io import load_audio
    from ..infer.engine import LLMSpeechTextInference

    config = load_config(args.config)
    engine = LLMSpeechTextInference(
        config, audio_encoder_checkpoint=args.audio_encoder_checkpoint,
        repetition_penalty=args.repetition_penalty,
        speculative_k=args.speculative_k,
    )

    ranges_fn = None
    if engine.encoder_setup.downsample_method == "ctc_pool":
        if not args.ctc:
            parser.error(
                "this config uses downsample_method=ctc_pool: pass "
                "--ctc <HuBERT-CTC checkpoint> (cli/convert.py ctc)"
            )
        from ..data.preprocess import load_ctc_fn, pool_ranges_for_audio

        ctc_fn = load_ctc_fn(args.ctc, args.ctc_preset, args.ctc_vocab)
        ranges_fn = lambda a: pool_ranges_for_audio(ctc_fn, a)  # noqa: E731

    if args.audio_dir is not None:
        _bulk(engine, config, args, ranges_fn)
        return

    audio = load_audio(args.audio_file, target_sr=config.audio.sampling_rate)
    response = engine.generate_audio_response(
        audio,
        additional_text_prompt=args.text,
        max_new_tokens=args.max_new_tokens,
        ctc_pool_ranges=ranges_fn(audio) if ranges_fn else None,
    )
    print("LLM Response:\n")
    print(response)


def _bulk(engine, config, args, ranges_fn=None):
    """Directory → JSONL through the pipelined batch stream. Files are
    size-sorted (a cheap stat-only length proxy — same codec, longer file ≈
    longer clip) so each batch shares a prompt bucket, audio loads LAZILY
    one group ahead of the decode (host RAM stays O(2 batches), not
    O(corpus)), and each batch's rows hit the JSONL sink as the batch
    completes — a crash at batch N keeps the first N-1 batches' output."""
    import json
    import os
    import sys

    from ..data.audio_io import load_audio

    exts = (".wav", ".flac")
    paths = sorted(
        os.path.join(r, f)
        for r, _, files in os.walk(args.audio_dir)
        for f in files
        if f.lower().endswith(exts)
    )
    if not paths:
        raise SystemExit(f"no {'/'.join(exts)} files under {args.audio_dir}")
    order = sorted(range(len(paths)), key=lambda i: os.path.getsize(paths[i]))
    bs = max(1, args.batch_size)
    groups = [order[i:i + bs] for i in range(0, len(order), bs)]

    batch_audio = {}  # current group's audio, shared with the ranges iter

    def lazy_batches():
        for gi, g in enumerate(groups):
            batch_audio[gi] = [
                load_audio(paths[i], target_sr=config.audio.sampling_rate)
                for i in g
            ]
            batch_audio.pop(gi - 2, None)  # keep ~2 groups in RAM
            yield batch_audio[gi]

    def lazy_ranges():
        for gi, g in enumerate(groups):
            yield [ranges_fn(a) for a in batch_audio[gi]]

    sink = open(args.output, "w") if args.output else sys.stdout
    written = 0
    try:
        for g, outs in zip(
            groups,
            engine.iter_audio_response_batches(
                lazy_batches(),
                additional_text_prompt=args.text,
                max_new_tokens=args.max_new_tokens,
                ctc_pool_ranges=lazy_ranges() if ranges_fn else None,
            ),
        ):
            for i, out in zip(g, outs):
                sink.write(json.dumps({"file": paths[i], "response": out}) + "\n")
            sink.flush()
            written += len(g)
    finally:
        if args.output:
            sink.close()
    if args.output:
        print(f"wrote {written} responses to {args.output}")


if __name__ == "__main__":
    main()
