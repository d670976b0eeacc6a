"""LLMSpeechTextInference — the product inference API.

Parity surface with the reference engine (reference: inference.py:18-137):
  * ``generate_text_response(input_text, max_new_tokens)``
    (reference: inference.py:76-93)
  * ``generate_audio_response(audio, additional_text_prompt, max_new_tokens)``
    including the interleaved text+audio prompt path
    (reference: inference.py:95-137)

TPU-native beyond the reference:
  * batched variants (``*_batch``) — the reference is strictly bs=1;
  * shape bucketing so XLA compiles one program per (prefill, max_new)
    bucket instead of per utterance length;
  * the whole prefill+decode loop is a single jitted function
    (infer/generate.py) instead of HF's eager generate;
  * the ctc_pool inference path actually works (the reference calls an
    undefined ``get_ctc_pool_ranges``, reference: inference.py:102).
"""

from __future__ import annotations

import os
from typing import List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..configs import Config
from ..models.audio_encoder import (
    audio_encoder_forward,
    encoder_setup_from_config,
    init_audio_encoder,
)
from ..models.llama import (
    LlamaConfig,
    fuse_llama_params,
    init_llama_params,
    llama_preset,
    quantize_llama_params,
)
from ..ops.splice import concat_mid_buffers, splice_sequences
from ..utils.prompts import prompt_template_for
from ..utils.tokenizer import Tokenizer, load_tokenizer
from .generate import greedy_generate


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _pad_batch(n: int) -> int:
    """Batch-size bucket: next power of two (XLA compiles one program per
    shape — without this, every distinct request-batch size pays a full
    compile, which dominated serving latency under mixed load)."""
    b = 1
    while b < n:
        b *= 2
    return b


class LLMSpeechTextInference:
    def __init__(
        self,
        config: Config,
        audio_encoder_params=None,
        audio_encoder_checkpoint: Optional[str] = None,
        llm_params=None,
        llm_cfg: Optional[LlamaConfig] = None,
        tokenizer: Optional[Tokenizer] = None,
        rng: Optional[jax.Array] = None,
        temperature: float = 0.0,
        top_k: int = 0,
        top_p: float = 1.0,
        repetition_penalty: float = 1.0,
        bucket: int = 64,
        decode_bucket: int = 64,
        mesh=None,
        speculative_k: int = 0,
    ):
        self.config = config
        # TP serving (VERDICT r2 #1): when a mesh with a "model" axis is
        # given, the frozen LLM decodes tensor-parallel — params shard per
        # llama_param_spec below, encoder/host uploads replicate onto the
        # mesh, and SlotDecoder/greedy_generate run sharded via GSPMD
        # propagation. mesh=None is the single-chip path, unchanged.
        self.mesh = mesh
        self.temperature = temperature
        self.top_k = top_k
        self.top_p = top_p
        # >1.0 damps the reference's documented greedy repetition loops
        # (reference: inference.py:169-171); 1.0 = exact parity behavior
        self.repetition_penalty = repetition_penalty
        # >0: greedy requests decode self-speculatively (k-token n-gram
        # draft + one (k+1)-token verification forward per round,
        # infer/generate.py::speculative_generate). Opt-in: wins when
        # drafts land (summarization repeats itself), costs ~4-15% when
        # they never do (PERF.md "speculative decoding" bounds). Only the
        # greedy/no-penalty path speculates; sampling falls through.
        self.speculative_k = speculative_k
        self.bucket = bucket  # prefill-length bucket (64-granular: the flash
        # kernel runs full-T blocks for T ≤ 512, so finer buckets cut padded
        # prefill FLOPs — 384 → 320 on the 10 s workload, ~17% less prefill)
        self.decode_bucket = decode_bucket  # max_new_tokens bucket
        self.dtype = jnp.dtype(config.model.compute_dtype)
        self.cache_dtype = jnp.dtype(config.model.kv_cache_dtype or config.model.compute_dtype)
        rng = rng if rng is not None else jax.random.PRNGKey(config.seed_everything)
        k_enc, k_llm = jax.random.split(rng)

        # LLM (frozen; reference: inference.py:46-52)
        self.llm_cfg = llm_cfg or llama_preset(config.model.llm_preset or config.model.llm_type)
        param_dtype = jnp.dtype(config.model.param_dtype)
        self.llm_params = (
            llm_params
            if llm_params is not None
            else init_llama_params(k_llm, self.llm_cfg, dtype=param_dtype)
        )
        if llm_params is None and config.model.llm_checkpoint:
            import orbax.checkpoint as ocp
            import os

            ckptr = ocp.StandardCheckpointer()
            self.llm_params = ckptr.restore(
                os.path.abspath(config.model.llm_checkpoint),
                {"llm_params": self.llm_params},
            )["llm_params"]

        # Serving-only decode optimizations: fused QKV/gate-up layout plus
        # weight-only int8 (halves the dominant decode HBM term). Applied
        # only to trees the engine owns — fuse/quantize DONATE their input,
        # and caller-owned trees (the Trainer's validate-time engine, which
        # keeps training in the exact bf16 weights) must stay intact.
        if config.model.llm_weight_dtype == "int8" and llm_params is None:
            self.llm_params = quantize_llama_params(fuse_llama_params(self.llm_params))

        # Audio encoder (reference: inference.py:23-28)
        self.encoder_setup = encoder_setup_from_config(config)
        self.audio_encoder_params = (
            audio_encoder_params
            if audio_encoder_params is not None
            else init_audio_encoder(k_enc, self.encoder_setup, dtype=param_dtype)
        )
        audio_encoder_checkpoint = audio_encoder_checkpoint or config.model.encoder_checkpoint
        if audio_encoder_checkpoint:
            from ..train.checkpoint import load_encoder

            self.audio_encoder_params = load_encoder(
                audio_encoder_checkpoint, self.audio_encoder_params
            )

        if mesh is not None:
            from ..parallel.sharding import (
                encoder_param_spec,
                llama_param_spec,
                shard_params,
            )

            # shard AFTER fuse/quantize so the spec sees the final layout
            self.llm_params = shard_params(
                mesh, self.llm_params, llama_param_spec(self.llm_params)
            )
            # encoder stays replicated (tiny next to the LLM) but must be
            # committed to the SAME device set as the sharded llm_params
            self.audio_encoder_params = shard_params(
                mesh,
                self.audio_encoder_params,
                encoder_param_spec(self.audio_encoder_params),
            )

        # Tokenizer + template (reference: inference.py:30-44)
        self.llm_type = config.model.llm_type
        self.tokenizer = tokenizer or load_tokenizer(
            self.llm_type, config.model.tokenizer_path
        )
        tpl = prompt_template_for(self.llm_type)
        self.template = tpl
        self.prefix_ids = jnp.asarray(
            self.tokenizer.encode(tpl.prefix, add_bos=True), jnp.int32
        )
        # BOS-strip convention for suffix (reference: utils.py:70-71)
        self.suffix_ids = jnp.asarray(
            self.tokenizer.encode(tpl.suffix, add_bos=False), jnp.int32
        )

        # jit caches: everything between host audio and the decode loop runs
        # as one compiled program per shape bucket (eager dispatch per-op is
        # catastrophic on remote-executed backends)
        self._audio_prompt_fns = {}
        dtype = self.dtype

        def embed_rows(llm_params, ids):
            """Token embeddings; with int8-quantized weights, rows are
            gathered at int8 width and dequantized per row — the full (V, D)
            table is never materialized in bf16."""
            t = llm_params["embed_tokens"]
            e = t[ids].astype(dtype)
            if t.dtype == jnp.int8:
                e = e * llm_params["embed_tokens_scale"][ids][..., None].astype(dtype)
            return e

        self._embed_rows = embed_rows
        self._concat_wav = jax.jit(
            lambda *parts: jnp.concatenate(parts, axis=0).astype(dtype)
        )
        self._text_embed_fn = jax.jit(
            lambda llm_params, ids, mask: (
                embed_rows(llm_params, ids) * mask[..., None].astype(dtype)
            )
        )

    # ------------------------------------------------------------------
    # internals
    # ------------------------------------------------------------------

    def _dev_put(self, x):
        """Host→device transfer; on a mesh, commit replicated onto the mesh
        device set (a bare device_put would commit to device 0 only, and
        mixing committed placements inside one jitted call is an error)."""
        if self.mesh is None:
            return jax.device_put(x)
        from jax.sharding import NamedSharding, PartitionSpec

        return jax.device_put(x, NamedSharding(self.mesh, PartitionSpec()))

    def _generate_from_embeds(
        self, embeds: jnp.ndarray, attn_mask: jnp.ndarray, max_new_tokens: int,
        rng=None, sampling=None,
    ) -> List[str]:
        """Run the jitted prefill+decode and detokenize
        (reference: inference.py:55-74).

        ``sampling``: optional per-request ``[(temperature, top_k, top_p,
        seed) | None, ...]`` (length = real batch; padded rows greedy) —
        traced per-row params, so one compiled program per bucket covers
        every greedy/sampling mix (infer/sampling.py)."""
        if sampling is not None and any(s is not None for s in sampling):
            from .sampling import pack_sampling_params

            packed = pack_sampling_params(sampling, embeds.shape[0])
            sampling = tuple(jnp.asarray(x) for x in packed)
        else:
            sampling = None
        if (
            sampling is None
            and self.speculative_k > 0
            and self.temperature <= 0.0
            and self.repetition_penalty == 1.0
        ):
            from .generate import speculative_generate

            tokens, lens, _ = speculative_generate(
                self.llm_params,
                self.llm_cfg,
                embeds.astype(self.dtype),
                attn_mask,
                max_new_tokens=_round_up(max_new_tokens, self.decode_bucket),
                eos_id=self.tokenizer.eos_id,
                k=self.speculative_k,
                cache_dtype=self.cache_dtype,
                num_steps=jnp.int32(max_new_tokens),
            )
            tokens = np.asarray(tokens)
            lens = np.asarray(lens)
            return [
                self.tokenizer.decode(
                    row[: min(int(n), max_new_tokens)].tolist(),
                    skip_special_tokens=True,
                )
                for row, n in zip(tokens, lens)
            ]
        tokens, lens = greedy_generate(
            self.llm_params,
            self.llm_cfg,
            embeds.astype(self.dtype),
            attn_mask,
            max_new_tokens=_round_up(max_new_tokens, self.decode_bucket),
            eos_id=self.tokenizer.eos_id,
            temperature=self.temperature,
            top_k=self.top_k,
            top_p=self.top_p,
            repetition_penalty=self.repetition_penalty,
            rng=rng,
            cache_dtype=self.cache_dtype,
            num_steps=jnp.int32(max_new_tokens),
            sampling=sampling,
            # fused decode attention+write kernel (kernels/fused_decode.py):
            # measured 12.5 vs 13.8 ms/step at B=128/S=448 int8 (PERF.md
            # round 4). Single-chip only — the pallas_call has no GSPMD
            # partitioning rule, so TP serving keeps the XLA formulation.
            attn_impl=(
                "fused"
                if self.mesh is None
                and os.environ.get("LSS_FUSED_DECODE", "1") != "0"
                else "auto"
            ),
        )
        tokens = np.asarray(tokens)
        lens = np.asarray(lens)
        out = []
        for row, n in zip(tokens, lens):
            n = min(int(n), max_new_tokens)
            out.append(self.tokenizer.decode(row[:n].tolist(), skip_special_tokens=True))
        return out

    def _audio_prompt_fn(self, has_text: bool, total_len: int):
        """Jitted wav→spliced-prompt builder, cached per (has_text, total_len).

        One compiled program covers: audio encoder forward, optional text
        embedding + mid-buffer concat (reference: inference.py:113-122), and
        the [prefix | mid | suffix] splice (reference: utils.py:49-73).
        """
        key = (has_text, total_len)
        if key not in self._audio_prompt_fns:
            setup = self.encoder_setup

            def fn(enc_params, llm_params, wav, wav_lens, ranges, txt_ids, txt_lens):
                audio_embeds, emb_lens = audio_encoder_forward(
                    enc_params, setup, wav, wav_lens, ctc_pool_ranges=ranges
                )
                # encoder + the shared splice tail trace into ONE program
                return self._splice_body(
                    llm_params, audio_embeds, emb_lens, txt_ids, txt_lens,
                    has_text=has_text, total_len=total_len,
                )

            self._audio_prompt_fns[key] = jax.jit(fn)
        return self._audio_prompt_fns[key]

    # ------------------------------------------------------------------
    # public API (reference parity)
    # ------------------------------------------------------------------

    def generate_text_response(self, input_text: str, max_new_tokens: int = 256) -> str:
        return self.generate_text_response_batch([input_text], max_new_tokens)[0]

    def build_text_prompt_batch(self, input_texts: Sequence[str]):
        """Templated text prompts → left-padded (B, L, D) embeds + mask
        (B power-of-two padded, L bucket-rounded). Shared by the one-shot
        generate path and the continuous batcher (serve/)."""
        n_real = len(input_texts)
        ids_list = [
            self.tokenizer.encode(self.template.full_text_prompt(t), add_bos=True)
            for t in input_texts
        ]
        L = _round_up(max(len(i) for i in ids_list), self.bucket)
        B = _pad_batch(n_real)
        ids_list = ids_list + [ids_list[0]] * (B - n_real)
        ids = np.zeros((B, L), np.int32)
        mask = np.zeros((B, L), bool)
        for b, row in enumerate(ids_list):  # left padding (reference: trainer.py:53)
            ids[b, L - len(row):] = row
            mask[b, L - len(row):] = True
        embeds = self._text_embed_fn(self.llm_params, jnp.asarray(ids), jnp.asarray(mask))
        return embeds, jnp.asarray(mask)

    def generate_text_response_batch(
        self, input_texts: Sequence[str], max_new_tokens: int = 256,
        sampling=None,
    ) -> List[str]:
        """Text-prompted generation (reference: inference.py:76-93), batched.

        The full templated prompt is tokenized and embedded directly — no
        splicing — exactly like the reference's f"{prefix} {text}{suffix} ".
        """
        if not input_texts:
            return []
        embeds, mask = self.build_text_prompt_batch(input_texts)
        out = self._generate_from_embeds(embeds, mask, max_new_tokens,
                                         sampling=sampling)
        return out[: len(input_texts)]

    def generate_audio_response(
        self,
        audio: np.ndarray,
        additional_text_prompt: str = "",
        max_new_tokens: int = 256,
        ctc_pool_ranges: Optional[np.ndarray] = None,
    ) -> str:
        return self.generate_audio_response_batch(
            [audio],
            additional_text_prompt=additional_text_prompt,
            max_new_tokens=max_new_tokens,
            ctc_pool_ranges=[ctc_pool_ranges] if ctc_pool_ranges is not None else None,
        )[0]

    def generate_audio_response_batch(
        self,
        audios: Sequence[np.ndarray],
        additional_text_prompt: str = "",
        max_new_tokens: int = 256,
        ctc_pool_ranges: Optional[Sequence[np.ndarray]] = None,
        sampling=None,
    ) -> List[str]:
        """Audio(+text)-prompted generation (reference: inference.py:95-137),
        batched over utterances of different lengths."""
        if not audios:
            return []
        embeds, mask = self.build_audio_prompt_batch(
            audios, additional_text_prompt, ctc_pool_ranges
        )
        return self._generate_from_embeds(
            embeds, mask, max_new_tokens, sampling=sampling
        )[: len(audios)]

    def generate_audio_response_batches(
        self,
        batches: Sequence[Sequence[np.ndarray]],
        additional_text_prompt: str = "",
        max_new_tokens: int = 256,
        sampling: Optional[Sequence] = None,  # per-batch, aligned with batches
        ctc_pool_ranges: Optional[Sequence] = None,  # per-batch, ditto
    ) -> List[List[str]]:
        """Bulk audio generation over a stream of batches, pipelined one
        batch deep: batch i+1's host→device upload + encoder forward runs
        on a background thread WHILE batch i's prefill+decode occupies the
        chip, so the per-batch host-transfer cost (~0.9 s for 128×10 s on
        the tunneled link) disappears from steady-state throughput. Token
        streams are identical to per-batch ``generate_audio_response_batch``
        calls — the pipeline reorders only the upload, not the compute.

        This is the offline/bulk-summarization surface the reference runs
        one file at a time (reference: inference.py:140-178); use it for
        anything that has its next batch ready before the current one
        finishes.
        """
        return list(
            self.iter_audio_response_batches(
                batches,
                additional_text_prompt=additional_text_prompt,
                max_new_tokens=max_new_tokens,
                sampling=sampling,
                ctc_pool_ranges=ctc_pool_ranges,
            )
        )

    def iter_audio_response_batches(
        self,
        batches,
        additional_text_prompt: str = "",
        max_new_tokens: int = 256,
        sampling: Optional[Sequence] = None,  # per-batch, aligned with batches
        ctc_pool_ranges: Optional[Sequence] = None,  # per-batch, ditto
    ):
        """Generator core of ``generate_audio_response_batches``: yields each
        batch's responses as it completes, holding at most TWO batches of
        audio in flight (the one decoding + the one prebuilding). ``batches``
        may be any iterable — a lazy generator keeps a large corpus out of
        host RAM, and callers can persist batch i's output before batch i+1
        finishes (crash-safe bulk jobs, cli/infer.py --audio_dir)."""
        from concurrent.futures import ThreadPoolExecutor

        samp_it = iter(sampling) if sampling is not None else None
        ranges_it = iter(ctc_pool_ranges) if ctc_pool_ranges is not None else None

        def staged(batch):
            """(batch_len, sampling, built prompt) for one batch — runs on
            the builder thread; per-batch extras are drawn in step."""
            try:
                s = next(samp_it) if samp_it is not None else None
                r = next(ranges_it) if ranges_it is not None else None
            except StopIteration:
                raise ValueError(
                    "sampling / ctc_pool_ranges ran out before batches did "
                    "(they must align per batch)"
                ) from None
            built = self.build_audio_prompt_batch(
                batch, additional_text_prompt, ctc_pool_ranges=r
            )
            return len(batch), s, built

        it = iter(batches)
        _end = object()
        with ThreadPoolExecutor(max_workers=1) as ex:
            nxt = next(it, _end)
            if nxt is _end:
                return
            fut = ex.submit(staged, nxt)
            while True:
                n_real, s, (embeds, mask) = fut.result()
                nxt = next(it, _end)
                if nxt is not _end:
                    fut = ex.submit(staged, nxt)
                out = self._generate_from_embeds(
                    embeds, mask, max_new_tokens, sampling=s
                )[:n_real]
                yield out
                if nxt is _end:
                    return

    def build_audio_prompt_batch(
        self,
        audios: Sequence[np.ndarray],
        additional_text_prompt: str = "",
        ctc_pool_ranges: Optional[Sequence[np.ndarray]] = None,
    ):
        """Audio(+text) prompts → spliced left-padded (B, L, D) embeds +
        mask, B power-of-two padded, L bucket-rounded."""
        n_real = len(audios)
        B = _pad_batch(n_real)
        audios = list(audios) + [audios[0]] * (B - n_real)
        lens = np.array([len(a) for a in audios], np.int32)
        N = _round_up(int(lens.max()), 1600)  # 100 ms audio buckets
        wav = np.zeros((B, N), np.float32)
        for b, a in enumerate(audios):
            wav[b, : len(a)] = a

        ranges = None
        if self.encoder_setup.downsample_method == "ctc_pool":
            assert ctc_pool_ranges is not None, "ctc_pool needs pool ranges"
            G = max(r.shape[0] for r in ctc_pool_ranges)
            ranges = np.zeros((B, G, 2), np.int32)
            for b, r in enumerate(ctc_pool_ranges):
                ranges[b, : r.shape[0]] = r
            ranges = jnp.asarray(ranges)

        has_text = len(additional_text_prompt) > 0
        if has_text:
            # BOS-strip; placed BEFORE the audio (reference: inference.py:113-122)
            txt_row = np.asarray(
                self.tokenizer.encode(additional_text_prompt, add_bos=False), np.int32
            )
            txt_ids = jnp.asarray(np.tile(txt_row, (B, 1)))
            txt_lens = jnp.full((B,), len(txt_row), jnp.int32)
        else:
            txt_ids = jnp.zeros((B, 0), jnp.int32)
            txt_lens = jnp.zeros((B,), jnp.int32)

        # static mid-buffer length via shape eval (cheap, host-side)
        M = self._audio_embed_buffer_len(N, ranges.shape[1] if ranges is not None else None)
        P, S = self.prefix_ids.shape[0], self.suffix_ids.shape[0]
        total_len = _round_up(P + M + txt_ids.shape[1] + S, self.bucket)

        if ranges is None and B >= 2 * self._upload_chunks:
            # pipelined path: upload chunk i+1 streams over the (slow,
            # tunneled) host link WHILE the encoder runs on chunk i — JAX
            # dispatch is async, so each thread's device_put + encoder call
            # returns immediately and the device interleaves transfer with
            # compute. Hides most of the encoder time inside the upload.
            audio_embeds, emb_lens = self._encode_pipelined(wav, lens)
            splice_fn = self._splice_fn(has_text, total_len)
            return splice_fn(self.llm_params, audio_embeds, emb_lens, txt_ids, txt_lens)

        prompt_fn = self._audio_prompt_fn(has_text, total_len)
        return prompt_fn(
            self.audio_encoder_params,
            self.llm_params,
            self._transfer_wav(wav),
            jnp.asarray(lens),
            ranges,
            txt_ids,
            txt_lens,
        )

    _upload_chunks = 4

    def _encode_pipelined(self, wav: np.ndarray, lens: np.ndarray):
        """Chunked host→device upload overlapped with per-chunk encoder runs.

        Each worker thread device_puts one (B/n, N) float16 slab and
        immediately dispatches the jitted encoder on it; while that chunk's
        encoder executes, the next thread's slab is still streaming over the
        host link. Audio embeds concat back to (B, M, D) on device. On this
        environment's tunneled backend the upload costs ~0.9 s for a 128×10 s
        batch — the encoder (~0.5 s) now rides inside it.
        """
        from concurrent.futures import ThreadPoolExecutor

        n = self._upload_chunks
        B = wav.shape[0]
        # floor-division split: callers guarantee power-of-two B ≥ 2n via
        # _pad_batch; fail loudly if a future change breaks that invariant
        # (silent truncation would drop trailing rows)
        if B % n != 0:
            raise ValueError(f"pipelined upload needs B % {n} == 0, got B={B}")
        rows = B // n
        wav16 = wav.astype(np.float16)

        if not hasattr(self, "_encode_chunk_jit"):
            setup, dtype = self.encoder_setup, self.dtype
            self._encode_chunk_jit = jax.jit(
                lambda p, w, l: audio_encoder_forward(p, setup, w.astype(dtype), l)
            )
            self._concat_embeds_jit = jax.jit(
                lambda es, ls: (jnp.concatenate(es, 0), jnp.concatenate(ls, 0))
            )
        enc = self._encode_chunk_jit
        params = self.audio_encoder_params

        def job(i):
            w = self._dev_put(wav16[i * rows : (i + 1) * rows])
            l = self._dev_put(lens[i * rows : (i + 1) * rows])
            return enc(params, w, l)  # async dispatch

        with ThreadPoolExecutor(n) as ex:
            outs = list(ex.map(job, range(n)))
        return self._concat_embeds_jit([o[0] for o in outs], [o[1] for o in outs])

    def _splice_body(self, llm_params, audio_embeds, emb_lens, txt_ids,
                     txt_lens, *, has_text: bool, total_len: int):
        """Traceable splice tail shared by the fused prompt builder and the
        pipelined path: optional text embeds + mid-buffer concat
        (reference: inference.py:113-122) and the [prefix | mid | suffix]
        splice (reference: utils.py:49-73). The splice only embeds
        prefix/suffix rows, so it gets a (P+S, D) mini-table of exactly
        those (dequantized) rows — int8-quantized models never materialize
        a full bf16 table."""
        embed_rows, dtype = self._embed_rows, self.dtype
        prefix_ids, suffix_ids = self.prefix_ids, self.suffix_ids
        P, S = int(prefix_ids.shape[0]), int(suffix_ids.shape[0])
        if has_text:
            txt_embeds = embed_rows(llm_params, txt_ids)
            mid, mid_lens = concat_mid_buffers(
                txt_embeds, txt_lens, audio_embeds.astype(dtype), emb_lens
            )
        else:
            mid, mid_lens = audio_embeds.astype(dtype), emb_lens
        mini = embed_rows(llm_params, jnp.concatenate([prefix_ids, suffix_ids]))
        sp = splice_sequences(
            mini,
            jnp.arange(P, dtype=jnp.int32),
            jnp.arange(P, P + S, dtype=jnp.int32),
            mid, mid_lens, total_len=total_len,
        )
        return sp.embeds, sp.attn_mask

    def _splice_fn(self, has_text: bool, total_len: int):
        """Jitted (audio_embeds, emb_lens) → spliced prompt; the encoder-free
        tail of _audio_prompt_fn, used by the pipelined upload path."""
        key = (has_text, total_len)
        if not hasattr(self, "_splice_fns"):
            self._splice_fns = {}
        if key not in self._splice_fns:
            def fn(llm_params, audio_embeds, emb_lens, txt_ids, txt_lens):
                return self._splice_body(
                    llm_params, audio_embeds, emb_lens, txt_ids, txt_lens,
                    has_text=has_text, total_len=total_len,
                )

            self._splice_fns[key] = jax.jit(fn)
        return self._splice_fns[key]

    def _transfer_wav(self, wav: np.ndarray, n_chunks: int = 4) -> jnp.ndarray:
        """Host→device audio upload, chunked over concurrent threads.

        On this environment's tunneled backend a single large device_put
        moves ~25 MB/s and occasionally stalls; 4 concurrent chunk puts run
        ~2× faster and bound the per-RPC payload (measured: 41 MB batch
        1.6 s → 0.8 s). Audio rides the wire as float16 (10 mantissa bits —
        more than bf16 gives the waveform) and is cast to compute dtype on
        device. On direct-attached TPUs this is one PCIe burst either way.
        """
        B = wav.shape[0]
        if B < 2 * n_chunks:
            return jnp.asarray(wav, self.dtype)
        from concurrent.futures import ThreadPoolExecutor

        wav16 = wav.astype(np.float16)
        rows = (B + n_chunks - 1) // n_chunks
        with ThreadPoolExecutor(n_chunks) as ex:
            parts = list(
                ex.map(
                    lambda i: self._dev_put(wav16[i * rows : (i + 1) * rows]),
                    range(n_chunks),
                )
            )
        return self._concat_wav(*parts)

    def _audio_embed_buffer_len(self, num_samples: int, num_ranges=None) -> int:
        key = (num_samples, num_ranges)
        if not hasattr(self, "_mbuf_cache"):
            self._mbuf_cache = {}
        if key not in self._mbuf_cache:
            ranges_shape = (
                None
                if num_ranges is None
                else jax.ShapeDtypeStruct((1, num_ranges, 2), jnp.int32)
            )
            out, _ = jax.eval_shape(
                lambda p, w, l, r: audio_encoder_forward(
                    p, self.encoder_setup, w, l, ctc_pool_ranges=r
                ),
                self.audio_encoder_params,
                jax.ShapeDtypeStruct((1, num_samples), self.dtype),
                jax.ShapeDtypeStruct((1,), jnp.int32),
                ranges_shape,
            )
            self._mbuf_cache[key] = out.shape[1]
        return self._mbuf_cache[key]
