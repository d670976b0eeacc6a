"""Preprocessing CLI — run the 4-step pipeline over a raw split.

Reference counterpart: preprocess_data/preprocess.py (MiniChat) and
preprocess_data/preprocess_llama3.py (Llama-3) __main__ blocks with
hardcoded paths/GPU (reference: preprocess.py:25,56). Here: one CLI, any
config, paths as flags.

Raw input: an HF dataset on disk with {audio, text} columns, a raw
LibriSpeech-style directory tree (*.flac / *.wav next to *.trans.txt files,
the format LibriSpeech actually ships — decoded by the from-scratch FLAC
frontend), or --synthetic N for fixture generation.

Usage:
  python -m llm_speech_summarization_tpu.cli.preprocess -c <yaml> \
      --input <hf_dataset_dir | librispeech_dir> --output <out_dir> [--ctc]
"""

from __future__ import annotations

import argparse


def main(argv=None):
    from ..utils.compile_cache import enable_compilation_cache

    enable_compilation_cache()
    parser = argparse.ArgumentParser()
    parser.add_argument("-c", "--config", type=str, required=True)
    parser.add_argument("--input", type=str, default=None,
                        help="HF dataset dir with {audio, text} columns")
    parser.add_argument("--synthetic", type=int, default=0,
                        help="generate N synthetic raw examples instead of --input")
    parser.add_argument("--output", type=str, required=True)
    parser.add_argument("--batch_size", type=int, default=32)
    parser.add_argument("--limit", type=int, default=None)
    parser.add_argument("--ctc_preset", type=str, default="hubert_large",
                        help="HuBERT preset of the --ctc checkpoint")
    parser.add_argument("--ctc_vocab", type=int, default=32,
                        help="CTC head vocab of the --ctc checkpoint")
    parser.add_argument("--ctc", type=str, default=None,
                        help="HuBERT-CTC checkpoint dir (cli/convert.py ctc) "
                        "-> emit word offsets + pool_ranges_4 (steps 3-4; "
                        "omitting leaves the llama3-style dummy columns, "
                        "reference: preprocess_llama3.py:113-122)")
    args = parser.parse_args(argv)

    import numpy as np

    from ..configs import load_config
    from ..data.preprocess import iter_preprocess_examples, save_preprocessed
    from ..infer.engine import LLMSpeechTextInference

    config = load_config(args.config)
    engine = LLMSpeechTextInference(config)

    # every input branch is a LAZY view (audio decoded/synthesized on
    # access): the pipeline below streams rows straight to arrow shards,
    # so no split's waveforms ever sit in host RAM at once
    if args.synthetic:
        from ..data.datasets import LazyRawView, SyntheticSpeechDataset

        ds = SyntheticSpeechDataset(engine.tokenizer, num_samples=args.synthetic)
        examples = LazyRawView(
            len(ds), lambda i: {"audio": ds[i]["audio"], "text": ds[i]["text"]}
        )
    else:
        if not args.input:
            parser.error("--input or --synthetic required")
        from ..data.datasets import LazyRawView, load_librispeech_dir

        examples = load_librispeech_dir(
            args.input, target_sr=config.audio.sampling_rate, limit=args.limit
        )
        if examples is None:  # not a raw audio tree → HF dataset on disk
            from datasets import load_from_disk

            raw = load_from_disk(args.input)
            n = len(raw) if args.limit is None else min(args.limit, len(raw))

            def _get(i, raw=raw):
                row = raw[i]
                audio = row["audio"]
                wav = np.asarray(
                    audio["array"] if isinstance(audio, dict) else audio, np.float32
                )
                return {"audio": wav, "text": row["text"]}

            examples = LazyRawView(n, _get)

    ctc_fn = None
    if args.ctc:
        from ..data.preprocess import load_ctc_fn

        ctc_fn = load_ctc_fn(args.ctc, args.ctc_preset, args.ctc_vocab)

    rows = iter_preprocess_examples(
        examples,
        engine,
        engine.tokenizer,
        ctc_fn=ctc_fn,
        max_seconds=config.audio.max_seconds,
        sampling_rate=config.audio.sampling_rate,
        response_batch_size=args.batch_size,
    )
    n_written = save_preprocessed(
        rows, args.output, sampling_rate=config.audio.sampling_rate
    )
    print(f"wrote {n_written} examples to {args.output}")


if __name__ == "__main__":
    main()
