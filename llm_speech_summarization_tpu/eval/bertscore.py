"""BERTScore: contextual-embedding summary similarity (Zhang et al., 2020).

BASELINE.md lists "ROUGE / BERTScore" as the reference's quality metrics
(its paper reports both; the reference repo computes neither —
SURVEY.md §6). `eval/rouge.py` covers ROUGE; this module covers BERTScore
with zero external dependencies: the algorithm (greedy cosine matching with
optional IDF weighting) is implemented directly, and the contextual
embedder is pluggable.

No pretrained BERT can be downloaded in this environment (zero egress), so
the default embedder (`LlamaEmbedder`) reuses the framework's own LLM: a
hidden layer of the (converted) Llama checkpoint is a perfectly good
contextual embedding space. With random-init weights the scores are only
internally consistent (useful for wiring tests); with converted weights
they are a real quality signal.

Algorithm (per candidate/reference pair):
  sim[i, j] = cos(cand_emb[i], ref_emb[j])
  recall    = Σ_j w_j · max_i sim[i, j] / Σ_j w_j     (w = IDF or 1)
  precision = Σ_i w_i · max_j sim[i, j] / Σ_i w_i
  F1        = 2PR / (P + R)
"""

from __future__ import annotations

import math
from collections import Counter
from typing import Callable, Dict, List, Optional, Sequence, Tuple

import numpy as np

# An embedder maps texts → per-text (token_embeddings (T, D), token_ids).
Embedder = Callable[[Sequence[str]], List[Tuple[np.ndarray, List[int]]]]


def _normalize(emb: np.ndarray) -> np.ndarray:
    emb = emb.astype(np.float64)
    norms = np.linalg.norm(emb, axis=-1, keepdims=True)
    return emb / np.maximum(norms, 1e-12)


def _idf_weights(ref_token_ids: List[List[int]]) -> Dict[int, float]:
    """Smoothed IDF over the reference corpus (the original paper's scheme):
    idf(t) = log((N + 1) / (df(t) + 1))."""
    n = len(ref_token_ids)
    df: Counter = Counter()
    for ids in ref_token_ids:
        df.update(set(ids))
    return {t: math.log((n + 1) / (d + 1)) for t, d in df.items()}


def pair_bert_score(
    cand_emb: np.ndarray,
    ref_emb: np.ndarray,
    cand_w: Optional[np.ndarray] = None,
    ref_w: Optional[np.ndarray] = None,
) -> Dict[str, float]:
    """Greedy-matching P/R/F1 for one (candidate, reference) embedding pair."""
    if cand_emb.shape[0] == 0 or ref_emb.shape[0] == 0:
        return {"precision": 0.0, "recall": 0.0, "f1": 0.0}
    sim = _normalize(cand_emb) @ _normalize(ref_emb).T  # (Tc, Tr)
    cw = np.ones(sim.shape[0]) if cand_w is None else np.asarray(cand_w, np.float64)
    rw = np.ones(sim.shape[1]) if ref_w is None else np.asarray(ref_w, np.float64)
    p = float((sim.max(axis=1) * cw).sum() / max(cw.sum(), 1e-12))
    r = float((sim.max(axis=0) * rw).sum() / max(rw.sum(), 1e-12))
    f = 2 * p * r / (p + r) if (p + r) else 0.0
    return {"precision": p, "recall": r, "f1": f}


def bert_score(
    candidates: Sequence[str],
    references: Sequence[str],
    embedder: Embedder,
    idf: bool = False,
) -> Dict[str, float]:
    """Corpus-mean BERTScore P/R/F1.

    ``embedder`` is called once over candidates and once over references
    (implementations batch internally). ``idf=True`` weights tokens by
    smoothed inverse document frequency computed over the references.
    """
    assert len(candidates) == len(references)
    if not candidates:
        return {"precision": 0.0, "recall": 0.0, "f1": 0.0}
    cands = embedder(list(candidates))
    refs = embedder(list(references))

    idf_map: Optional[Dict[int, float]] = (
        _idf_weights([ids for _, ids in refs]) if idf else None
    )

    def weights(ids: List[int]) -> Optional[np.ndarray]:
        if idf_map is None:
            return None
        w = np.asarray([idf_map.get(t, math.log(len(refs) + 1)) for t in ids])
        # tiny corpora degenerate: with N references where every token
        # appears in all of them, idf = log((N+1)/(N+1)) = 0 for ALL
        # tokens (guaranteed at N=1) and recall/f1 would report 0.0
        # regardless of similarity — fall back to uniform weighting
        if w.size and not w.any():
            return None
        return w

    ps, rs, fs = [], [], []
    for (ce, cids), (re_, rids) in zip(cands, refs):
        s = pair_bert_score(ce, re_, weights(cids), weights(rids))
        ps.append(s["precision"])
        rs.append(s["recall"])
        fs.append(s["f1"])
    return {
        "precision": float(np.mean(ps)),
        "recall": float(np.mean(rs)),
        "f1": float(np.mean(fs)),
    }


class LlamaEmbedder:
    """Contextual token embeddings from a hidden layer of the framework LLM.

    One jitted forward per (padded) batch; sequences are left-padded to a
    64-multiple bucket so repeat calls reuse compiled programs (the repo's
    static-shape rule). ``layer`` indexes the HF-style hidden_states stack
    (0 = embedding output, i = block i output; default: a mid-stack layer,
    which BERTScore's own tuning found more correlated with human judgment
    than the final layer).
    """

    def __init__(self, llm_params, llm_cfg, tokenizer, layer: Optional[int] = None,
                 max_tokens: int = 256, batch_size: int = 16):
        import jax
        import jax.numpy as jnp

        self._jnp = jnp
        self.params = llm_params
        self.cfg = llm_cfg
        self.tokenizer = tokenizer
        self.layer = layer if layer is not None else llm_cfg.num_layers // 2
        self.max_tokens = max_tokens
        self.batch_size = batch_size

        from ..models.llama import llama_forward

        def fwd(params, ids, mask):
            out = llama_forward(
                params, llm_cfg, input_ids=ids, attn_mask=mask,
                return_hidden=True, compute_logits=False, attn_impl="xla",
            )
            return out.hidden_states[self.layer]

        self._fwd = jax.jit(fwd)

    def __call__(self, texts: Sequence[str]) -> List[Tuple[np.ndarray, List[int]]]:
        jnp = self._jnp
        all_ids = [
            self.tokenizer.encode(t, add_bos=False)[: self.max_tokens] for t in texts
        ]
        out: List[Tuple[np.ndarray, List[int]]] = []
        for i in range(0, len(all_ids), self.batch_size):
            chunk = all_ids[i : i + self.batch_size]
            # pad the batch dim to batch_size: every distinct (B, L) pair
            # compiles a fresh full-LLM program (the engine pads the same
            # way, infer/engine.py::_pad_batch), so a trailing B=2 chunk
            # would cost a minutes-long compile on remote backends
            B = self.batch_size
            L = max(max((len(x) for x in chunk), default=1), 1)
            L = ((L + 63) // 64) * 64
            ids = np.zeros((B, L), np.int32)
            mask = np.zeros((B, L), bool)
            for b, x in enumerate(chunk):  # LEFT pad (repo convention)
                if x:
                    ids[b, L - len(x):] = x
                    mask[b, L - len(x):] = True
            hid = np.asarray(self._fwd(self.params, jnp.asarray(ids), jnp.asarray(mask)))
            for b, x in enumerate(chunk):
                out.append((hid[b, L - len(x):] if x else hid[b, :0], list(x)))
        return out
