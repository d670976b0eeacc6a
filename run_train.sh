#!/bin/bash
# Launch training (reference: run_train.sh:1-7). Pass a different config for
# MiniChat/Whisper variants; --mesh overrides the device mesh (e.g. "4,2").
python -m llm_speech_summarization_tpu.cli.train \
    -c llm_speech_summarization_tpu/configs/yaml/llama3_hubert.yaml \
    -n llama3_hubert_full \
    "$@"
