#!/usr/bin/env bash
# Push-button real-weights verification runbook (VERDICT r2 #5).
#
# This environment has zero egress, so the core BASELINE metric —
# ROUGE/BERTScore parity on LibriSpeech test-clean — cannot be measured
# here (the reference loads HF weights unconditionally,
# reference: inference.py:24-27, trainer.py:58-64). A weights-available
# operator runs THIS script and gets the parity table with no code
# reading:
#
#   HF_LLAMA=/path/to/Llama-3.2-3B-Instruct \
#   HF_HUBERT=/path/to/hubert-large-ls960-ft \
#   ENCODER_CKPT=/path/to/released_audio_encoder_orbax   # optional: a
#       trained encoder export (train/checkpoint.py format). Without it the
#       projector is random-init — conversion/goldens still verify, but the
#       quality table is meaningless.
#   DATA=/path/to/librispeech_hf_llama3                  # preprocessed HF-disk
#       dir (cli/preprocess.py output, reference column schema); optional —
#       without it the quality step is skipped.
#   bash scripts/verify_weights.sh
#
# Steps (each gated on its inputs, all idempotent):
#   1. convert HF Llama   -> ckpts/verify/llama3_3b      (cli/convert.py llm)
#   2. convert HF HuBERT  -> ckpts/verify/hubert_large   (cli/convert.py encoder)
#   3. regenerate + pytest the golden fixtures with the REAL tokenizer
#      (prompt/splice/token-stream contracts vs the reference)
#   4. HF-parity tests (converted weights vs transformers outputs)
#   5. cli/evaluate.py --bertscore on $DATA -> parity table JSON
set -euo pipefail
cd "$(dirname "$0")/.."

HF_LLAMA="${HF_LLAMA:-}"
HF_HUBERT="${HF_HUBERT:-}"
ENCODER_CKPT="${ENCODER_CKPT:-}"
DATA="${DATA:-}"
OUT="${OUT:-ckpts/verify}"
CFG_IN="llm_speech_summarization_tpu/configs/yaml/llama3_hubert.yaml"
CFG="$OUT/verify_config.yaml"

[ -n "$HF_LLAMA" ] || { echo "set HF_LLAMA=/path/to/Llama-3.2-3B-Instruct"; exit 2; }
[ -n "$HF_HUBERT" ] || { echo "set HF_HUBERT=/path/to/hubert-large-ls960-ft"; exit 2; }
mkdir -p "$OUT"

echo "== [1/5] convert LLM -> $OUT/llama3_3b"
[ -d "$OUT/llama3_3b" ] || python -m llm_speech_summarization_tpu.cli.convert llm \
    --hf_dir "$HF_LLAMA" --preset llama3_3b --output "$OUT/llama3_3b"

echo "== [2/5] convert encoder -> $OUT/hubert_large"
[ -d "$OUT/hubert_large" ] || python -m llm_speech_summarization_tpu.cli.convert encoder \
    -c "$CFG_IN" --hf_dir "$HF_HUBERT" --output "$OUT/hubert_large"

# optional: a HubertForCTC checkpoint (facebook/hubert-large-ls960-ft with
# its lm_head) enables the preprocess CLI's --ctc word-offset stage for
# ctc_pool configs: set HF_HUBERT_CTC=/path/to/hubert-large-ls960-ft
if [ -n "${HF_HUBERT_CTC:-}" ]; then
  echo "== [2b] convert HuBERT-CTC -> $OUT/hubert_ctc"
  [ -d "$OUT/hubert_ctc" ] || python -m llm_speech_summarization_tpu.cli.convert ctc \
      --hf_dir "$HF_HUBERT_CTC" --output "$OUT/hubert_ctc"
fi

echo "== write $CFG (checkpoints + real tokenizer wired in)"
python - "$CFG_IN" "$CFG" <<EOF
import sys, yaml
src, dst = sys.argv[1], sys.argv[2]
raw = yaml.safe_load(open(src))
raw["model"]["llm_checkpoint"] = "$OUT/llama3_3b"
raw["model"]["encoder_checkpoint"] = "${ENCODER_CKPT:-$OUT/hubert_large}"
raw["model"]["tokenizer_path"] = "$HF_LLAMA"  # fails loudly if unloadable
if "$DATA":
    raw["data"]["base_path"] = "$DATA"
yaml.safe_dump(raw, open(dst, "w"))
print("wrote", dst)
EOF

echo "== [3/5] goldens with the real tokenizer"
python scripts/make_goldens.py --tokenizer "$HF_LLAMA"
python -m pytest tests/test_goldens.py -q

echo "== [4/5] HF parity: tiny-config converter tests + REAL-weights logits"
echo "   (+ the fused-kernel margin contract and seeded-sampling goldens —"
echo "    on a real TPU these drive the ACTUAL Pallas hot paths: fused"
echo "    decode attention+write, paged fusion, per-request sampler)"
LSS_HF_LLAMA_DIR="$HF_LLAMA" LSS_HF_HUBERT_DIR="$HF_HUBERT" \
    python -m pytest tests/test_hf_parity.py tests/test_real_weights.py \
    "tests/test_fused_decode.py::test_fused_margin_aware_stream" \
    "tests/test_goldens.py::test_sampled_tokens_golden" \
    "tests/test_goldens.py::test_sampled_tokens_replay_invariant" -q

if [ -n "$DATA" ]; then
  echo "== [5/5] quality table (ROUGE + BERTScore) on $DATA"
  python -m llm_speech_summarization_tpu.cli.evaluate -c "$CFG" \
      --num_samples "${NUM_SAMPLES:-256}" --bertscore | tee "$OUT/parity_table.json"
  echo "parity table: $OUT/parity_table.json"
  echo "compare against the reference's outputs on the same clips"
  echo "(run reference/inference.py per clip; BASELINE.md 'metric')."
else
  echo "== [5/5] SKIPPED quality table: set DATA=/path/to/preprocessed_hf"
fi
echo "verify_weights: all requested steps completed"
