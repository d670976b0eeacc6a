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


# ---------------------------------------------------------------- bertscore


def _toy_embedder(texts):
    """Deterministic per-word embeddings: hash each word to a fixed vector."""
    out = []
    for t in texts:
        words = t.lower().split()
        embs = []
        for w in words:
            rng = np.random.RandomState(abs(hash(w)) % (2**31))
            embs.append(rng.randn(16))
        emb = np.stack(embs) if embs else np.zeros((0, 16))
        out.append((emb, [abs(hash(w)) % (2**31) for w in words]))
    return out


def test_bertscore_identical_is_one():
    from llm_speech_summarization_tpu.eval.bertscore import bert_score

    s = bert_score(["the cat sat"], ["the cat sat"], _toy_embedder)
    assert abs(s["f1"] - 1.0) < 1e-9
    assert abs(s["precision"] - 1.0) < 1e-9
    assert abs(s["recall"] - 1.0) < 1e-9


def test_bertscore_permutation_invariant():
    """Greedy matching ignores order (unlike ROUGE-2/L) — the metric's point."""
    from llm_speech_summarization_tpu.eval.bertscore import bert_score

    s = bert_score(["sat cat the"], ["the cat sat"], _toy_embedder)
    assert abs(s["f1"] - 1.0) < 1e-9


def test_bertscore_matches_bruteforce():
    """pair_bert_score == a literal numpy transcription of the paper's eqs."""
    from llm_speech_summarization_tpu.eval.bertscore import pair_bert_score

    rng = np.random.RandomState(0)
    c, r = rng.randn(5, 8), rng.randn(7, 8)
    cn = c / np.linalg.norm(c, axis=1, keepdims=True)
    rn = r / np.linalg.norm(r, axis=1, keepdims=True)
    sim = cn @ rn.T
    p_ref = sim.max(axis=1).mean()
    r_ref = sim.max(axis=0).mean()
    f_ref = 2 * p_ref * r_ref / (p_ref + r_ref)
    s = pair_bert_score(c, r)
    assert abs(s["precision"] - p_ref) < 1e-9
    assert abs(s["recall"] - r_ref) < 1e-9
    assert abs(s["f1"] - f_ref) < 1e-9


def test_bertscore_idf_downweights_common_tokens():
    """A mismatch on a corpus-ubiquitous word costs less under idf=True."""
    from llm_speech_summarization_tpu.eval.bertscore import bert_score

    # 'the' appears in every reference → idf ~ log(4/4)=0; 'dog'/'cat' rare.
    refs = ["the cat", "the dog", "the bird"]
    cands = ["the cat", "the dog", "the fish"]
    plain = bert_score(cands, refs, _toy_embedder, idf=False)
    idf = bert_score(cands, refs, _toy_embedder, idf=True)
    # pair 3 mismatches only on the rare token; idf puts ALL weight there,
    # so the idf corpus score drops below the unweighted one
    assert idf["f1"] < plain["f1"]


def test_bertscore_ranks_related_higher():
    from llm_speech_summarization_tpu.eval.bertscore import bert_score

    close = bert_score(["the cat sat on the mat"], ["the cat sat on a mat"], _toy_embedder)
    far = bert_score(["the cat sat on the mat"], ["quantum flux harmonics"], _toy_embedder)
    assert close["f1"] > far["f1"]


def test_llama_embedder_and_engine_wiring():
    """LlamaEmbedder produces contextual embeddings of the right shapes and
    bert_score consumes them end-to-end (tiny model, ByteTokenizer)."""
    import jax
    import jax.numpy as jnp

    from llm_speech_summarization_tpu.eval.bertscore import LlamaEmbedder, bert_score
    from llm_speech_summarization_tpu.models.llama import init_llama_params, llama_preset
    from llm_speech_summarization_tpu.utils.tokenizer import ByteTokenizer

    cfg = llama_preset("tiny")
    params = init_llama_params(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
    emb = LlamaEmbedder(params, cfg, ByteTokenizer(), batch_size=2)
    outs = emb(["hello world", "a", ""])
    assert len(outs) == 3
    assert outs[0][0].shape == (len("hello world"), cfg.hidden_size)
    assert outs[1][0].shape == (1, cfg.hidden_size)
    assert outs[2][0].shape == (0, cfg.hidden_size)
    s = bert_score(["hello world", "abc"], ["hello world", "xyz"], emb, idf=True)
    assert abs(s["f1"]) <= 1.0 + 1e-9
    # identical first pair under a deterministic embedder scores higher than
    # the disjoint second pair — check per-pair via direct calls
    from llm_speech_summarization_tpu.eval.bertscore import pair_bert_score

    e = emb(["hello world", "hello world", "abc", "xyz"])
    same = pair_bert_score(e[0][0], e[1][0])["f1"]
    diff = pair_bert_score(e[2][0], e[3][0])["f1"]
    assert same > diff - 1e-9 and abs(same - 1.0) < 1e-5
