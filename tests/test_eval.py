import numpy as np

from llm_speech_summarization_tpu.eval.rouge import rouge_l, rouge_n, rouge_scores


def test_rouge1_exact_match():
    s = rouge_n("the cat sat", "the cat sat", 1)
    assert s["f1"] == 1.0 and s["precision"] == 1.0 and s["recall"] == 1.0


def test_rouge1_hand_computed():
    # pred: {the, cat} ∩ ref: {the, cat, sat} → matches 2, P=2/2, R=2/3
    s = rouge_n("the cat", "the cat sat", 1)
    assert abs(s["precision"] - 1.0) < 1e-9
    assert abs(s["recall"] - 2 / 3) < 1e-9
    assert abs(s["f1"] - 0.8) < 1e-9


def test_rouge2():
    # bigrams pred: (a,b),(b,c); ref: (a,b),(b,d) → 1 match, P=R=1/2
    s = rouge_n("a b c", "a b d", 2)
    assert abs(s["f1"] - 0.5) < 1e-9


def test_rouge_l_subsequence():
    # LCS("a b c d", "a x c y") = a c → 2; P=2/4, R=2/4
    s = rouge_l("a b c d", "a x c y")
    assert abs(s["f1"] - 0.5) < 1e-9


def test_rouge_case_and_punct_insensitive():
    s = rouge_n("The CAT, sat!", "the cat sat", 1)
    assert s["f1"] == 1.0


def test_corpus_scores():
    out = rouge_scores(["a b", "c d"], ["a b", "c e"])
    assert abs(out["rouge1"] - 0.75) < 1e-9
    assert out["rouge2"] <= out["rouge1"]


def test_evaluate_engine_tiny():
    import os

    from llm_speech_summarization_tpu.configs import load_config
    from llm_speech_summarization_tpu.data.datasets import SyntheticSpeechDataset
    from llm_speech_summarization_tpu.eval.evaluate import evaluate_engine
    from llm_speech_summarization_tpu.infer.engine import LLMSpeechTextInference

    yaml = os.path.join(
        os.path.dirname(__file__), "..", "llm_speech_summarization_tpu", "configs",
        "yaml", "tiny_test.yaml",
    )
    cfg = load_config(yaml)
    eng = LLMSpeechTextInference(cfg)
    ds = SyntheticSpeechDataset(eng.tokenizer, num_samples=4, max_seconds=1.5)
    m = evaluate_engine(eng, ds, num_samples=2, batch_size=2, max_new_tokens=8,
                        measure_latency=False)
    assert set(m) >= {"rouge1", "rouge2", "rougeL", "num_samples"}
    assert 0.0 <= m["rouge1"] <= 1.0
