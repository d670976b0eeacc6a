"""Slot-based continuous batching decoder.

The reference serves one file per process (reference: inference.py:140-178)
and round 1's serving batcher was request-level: a batch ran to its full
token budget before ANY new request could start. This module decouples the
two phases production-style (vLLM/JetStream-like, TPU-static-shape flavor):

  * a persistent KV cache of N slots lives on device;
  * ``admit`` prefills new requests as a mini-batch and scatters their
    K/V rows + state into free slots (one jitted program per
    (n_new, prompt_bucket));
  * ``decode_chunk`` advances ALL live slots k steps with PER-ROW cache
    offsets/windows (one jitted program, reused forever);
  * between chunks the host harvests finished rows (EOS or budget) and
    frees their slots — short requests return without waiting for long
    co-batched ones, and new requests join mid-decode.

Static shapes throughout: the decode program never recompiles; admission
compiles once per prompt-length bucket.
"""

from __future__ import annotations

import functools
import os
from typing import List, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..models.llama import KVCache, LlamaConfig, init_kv_cache, llama_forward
from .paged import pages_needed as pages_needed_for
from .sampling import sample_rows as _sample_rows


class SlotState(NamedTuple):
    cache: KVCache
    pad_lens: jnp.ndarray  # (N,) int32 — row window start in the cache
    offsets: jnp.ndarray  # (N,) int32 — next cache slot to write (row depth)
    last_token: jnp.ndarray  # (N,) int32
    done: jnp.ndarray  # (N,) bool
    tokens: jnp.ndarray  # (N, max_new) int32 emitted tokens, eos-padded
    n_emitted: jnp.ndarray  # (N,) int32
    budgets: jnp.ndarray  # (N,) int32
    seen: jnp.ndarray  # (N, V) bool iff repetition penalty on, else (N, 1)
    # per-request sampling params (infer/sampling.py): a slot's base PRNG
    # key data plus temperature / top-k / top-p. temps <= 0 → exact greedy.
    rng: jnp.ndarray  # (N, 2) uint32
    temps: jnp.ndarray  # (N,) f32
    top_ks: jnp.ndarray  # (N,) int32
    top_ps: jnp.ndarray  # (N,) f32




def _seed_seen(seen: jnp.ndarray, slot_ids, first) -> jnp.ndarray:
    """Reset admitted rows' seen-token sets and mark their first token
    (no-op (N, 1) dummy when the repetition penalty is off)."""
    if seen.shape[1] == 1:
        return seen
    return seen.at[slot_ids].set(False, mode="drop").at[slot_ids, first].set(
        True, mode="drop"
    )

class SlotDecoder:
    """Device-resident decode slots over a frozen LLM."""

    def __init__(
        self,
        llm_params,
        cfg: LlamaConfig,
        eos_id: int,
        n_slots: int = 32,
        max_prompt_len: int = 512,
        max_new_tokens: int = 256,
        cache_dtype=jnp.bfloat16,
        paged: bool = False,
        page_size: int = 64,
        num_pages: Optional[int] = None,
        repetition_penalty: float = 1.0,
        mesh=None,
        spec_k: int = 0,
    ):
        self.params = llm_params
        self.cfg = cfg
        self.eos_id = eos_id
        self.n_slots = n_slots
        # TP serving (VERDICT r2 #1): decode sharded over the mesh "model"
        # axis. llm_params must arrive pre-sharded (parallel/sharding.py::
        # llama_param_spec — the engine does this); the cache state shards
        # on its KV-head axis to match (slot_state_spec), so decode runs
        # with only the per-block wo all-reduce as communication.
        self.mesh = mesh
        # serving-side mirror of infer/generate.py's knob (the reference's
        # documented greedy-repetition failure, inference.py:169-171)
        self.repetition_penalty = repetition_penalty
        # spec_k > 0 enables SPECULATIVE decode chunks (decode_chunk(...,
        # spec=True)): each round drafts spec_k tokens from the row's own
        # output history (infer/generate.py::_ngram_propose) and verifies
        # them in ONE (spec_k+1)-token forward at the row's cache offset —
        # decode is weight-stream bound, so the verification forward costs
        # ~one step and each round commits 1+accepted tokens. Token-exact
        # vs plain greedy under matched precision; the scheduler only uses
        # spec chunks for all-greedy batches (serve/server.py).
        self.spec_k = spec_k
        if spec_k > 0 and repetition_penalty != 1.0:
            raise ValueError(
                "speculative decode chunks verify exact greedy streams; "
                "repetition_penalty is incompatible (same contract as the "
                "engine's speculative_k)"
            )
        self.max_prompt_len = max_prompt_len
        self.max_new = max_new_tokens
        # + spec headroom: a verification round writes its spec_k+1 fresh
        # K/V at the row's offset BEFORE knowing how many commit, so the
        # last round of a budget-exhausting row can touch offset+spec_k.
        # Rounded up to a 32 multiple: the fused decode kernels require
        # S % 32 == 0 (kernels/fused_decode.py WINDOW) — before round 5 the
        # +spec_k+1 headroom silently knocked every spec-enabled decoder
        # (including its plain T==1 chunks) off the fused path.
        self.max_len = max_prompt_len + max_new_tokens + (spec_k + 1 if spec_k else 0)
        self.max_len = (self.max_len + 31) // 32 * 32
        # paged mode (infer/paged.py): ceil(len/page_size) pages per row
        # instead of max_len reserved per slot; bf16 or int8 pools (int8
        # halves pool bytes — the dense cache stays the latency champion,
        # PERF.md).
        self.paged = paged
        if paged and jnp.dtype(cache_dtype) == jnp.int8 and page_size % 128 != 0:
            # int8 scale slabs DMA as (1, page_size) rows whose lane dim
            # must be 128-aligned on TPU (kernels/paged_attention.py)
            page_size = 128
        self.page_size = page_size
        if paged:
            from .paged import PageAllocator

            # capacity default: ~60% of the fully-dense footprint — the
            # point of paging is that rows rarely all run to max_len —
            # floored at one page per slot (+ null page) so a full house of
            # single-page rows always admits (at mp == 1, e.g. int8's
            # page_size bump, 0.6·worst is SMALLER than n_slots)
            worst = n_slots * pages_needed_for(self.max_len, page_size)
            self.num_pages = num_pages or max(2, n_slots + 1, int(0.6 * worst) + 1)
            self.allocator = PageAllocator(self.num_pages)
            # host mirror of page ownership per slot: alloc/free decisions
            # never read the device table (each read is an RPC round-trip
            # on remote backends)
            self._host_table = np.zeros(
                (n_slots, pages_needed_for(self.max_len, page_size)), np.int32
            )
        self.cache_dtype = cache_dtype  # bf16/f32 or int8 (paged included)
        self.state = self._init_state()
        self._state_shardings = None
        if mesh is not None:
            from jax.sharding import NamedSharding

            from ..parallel.sharding import slot_state_spec

            self._state_shardings = jax.tree_util.tree_map(
                lambda s: NamedSharding(mesh, s), slot_state_spec(self.state, mesh)
            )
            self.state = jax.tree_util.tree_map(
                jax.device_put, self.state, self._state_shardings
            )
        # fused decode attention+write kernels (dense: kernels/
        # fused_decode.py — T==1 steps AND, round 5, the T==spec_k+1
        # verification forwards via the aliased-scale kernel; paged:
        # kernels/fused_paged.py, T==1 steps only — paged spec-verify
        # forwards fall through to the XLA paged path inside
        # llama_forward). LSS_FUSED_DECODE=0 reverts to the XLA decode.
        #
        # Under a model-sharded mesh the fused kernels run inside an
        # explicit shard_map over "model" (per-KV-head independent, zero
        # collectives — models/llama.py decode_fused); passing
        # ``tp_mesh`` also makes llama_forward route every NON-fused path
        # through the XLA formulations, because the plain pallas_calls
        # (paged decode, flash prefill) have no GSPMD partitioning rule and
        # would force their sharded operands replicated (an all-gather of
        # the whole KV pool per layer).
        fused_on = os.environ.get("LSS_FUSED_DECODE", "1") != "0"
        tp = dict(mesh.shape).get("model", 1) if mesh is not None else 1
        self._tp_mesh = mesh if tp > 1 else None
        if tp > 1:
            heads_ok = cfg.num_kv_heads % tp == 0 and cfg.num_heads % tp == 0
            self._attn_impl = "fused" if fused_on and heads_ok else "xla"
        else:
            self._attn_impl = (
                "fused" if mesh is None and fused_on else "auto"
            )
        self._admit_fns = {}
        self._chunk_fns = {}
        self._release_fns = {}  # set_done → jitted row-release program

    def _jit_state_fn(self, fn, extra_out: bool = False):
        """jit with state donation; on a mesh, pin the output SlotState to
        the canonical shardings so donation reuses the input buffers and
        the state's placement never drifts between programs. ``extra_out``:
        the fn returns (state, aux) — aux replicates (it is host-read)."""
        if self._state_shardings is None:
            return functools.partial(jax.jit, donate_argnums=(1,))(fn)
        out = self._state_shardings
        if extra_out:
            from jax.sharding import NamedSharding, PartitionSpec

            out = (out, NamedSharding(self.mesh, PartitionSpec()))
        return jax.jit(fn, donate_argnums=(1,), out_shardings=out)

    def _init_state(self) -> SlotState:
        N = self.n_slots
        if self.paged:
            from .paged import init_paged_cache

            cache = init_paged_cache(
                self.cfg.num_layers,
                self.cfg.num_kv_heads,
                self.cfg.head_dim,
                num_pages=self.num_pages,
                page_size=self.page_size,
                batch=N,
                max_pages_per_seq=pages_needed_for(self.max_len, self.page_size),
                dtype=self.cache_dtype,
            )
        else:
            cache = init_kv_cache(self.cfg, N, self.max_len, dtype=self.cache_dtype)
        V = self.cfg.vocab_size if self.repetition_penalty != 1.0 else 1
        return SlotState(
            cache=cache,
            pad_lens=jnp.zeros((N,), jnp.int32),
            offsets=jnp.ones((N,), jnp.int32),  # ≥1 so done rows write slot 0 harmlessly
            last_token=jnp.full((N,), self.eos_id, jnp.int32),
            done=jnp.ones((N,), bool),
            tokens=jnp.full((N, self.max_new), self.eos_id, jnp.int32),
            n_emitted=jnp.zeros((N,), jnp.int32),
            budgets=jnp.zeros((N,), jnp.int32),
            seen=jnp.zeros((N, V), bool),
            rng=jnp.zeros((N, 2), jnp.uint32),
            temps=jnp.zeros((N,), jnp.float32),
            top_ks=jnp.zeros((N,), jnp.int32),
            top_ps=jnp.ones((N,), jnp.float32),
        )

    # ------------------------------------------------------------------

    def sync_flags(self) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
        """(done, budgets, n_emitted) in ONE device→host transfer.

        On remote-dispatch backends every host read is an RPC round-trip
        (~100-200 ms here); free_slots/live_count/harvest each pulling their
        own arrays made the scheduler loop transfer-bound. Callers fetch
        once per loop and pass the copies down."""
        stacked = np.array(  # np.array: WRITABLE copy (admission mutates it)
            jnp.stack(
                [
                    self.state.done.astype(jnp.int32),
                    self.state.budgets,
                    self.state.n_emitted,
                ]
            )
        )
        return stacked[0].astype(bool), stacked[1], stacked[2]

    def free_slots(self, done: Optional[np.ndarray] = None) -> List[int]:
        if done is None:
            done = np.asarray(self.state.done)
        return [int(i) for i in np.nonzero(done)[0]]

    def admit(
        self,
        embeds: jnp.ndarray,  # (n, T, D) left-padded prompt embeddings
        mask: jnp.ndarray,  # (n, T) bool
        slot_ids: List[int],
        budgets: List[int],
        sampling=None,  # optional per-request [(temperature, top_k, top_p,
        # seed), ...] — None / temperature<=0 rows decode greedily
    ) -> None:
        """Prefill ``len(slot_ids)`` requests into their slots.

        ``embeds``/``mask`` MAY carry more rows than ``slot_ids``: the
        trailing rows are treated as batch padding (they prefill into the
        out-of-range drop slot ``n_slots`` with budget 0 — every scatter
        uses mode="drop", so they write nowhere). The serving builder
        already pads waves to a power-of-two batch
        (engine._pad_batch), and passing those buffers through UNSLICED is
        the zero-eager-op path: slicing to the real count and re-padding
        here costs per-(count, reps) jnp slice/tile/concat dispatches —
        each distinct real count is a fresh XLA compile that warmup's
        exact-power-of-two ladder can never cover (measured: 4.5-5.5 s of
        mid-wave admit stalls on the serving burst, PERF.md round 5)."""
        n, T, _ = embeds.shape
        n_real_req = len(slot_ids)
        if n_real_req > n:
            raise ValueError(
                f"{n_real_req} slot_ids for {n} embed rows"
            )
        if len(budgets) != n_real_req:
            raise ValueError("slot_ids and budgets must have equal length")
        if n_real_req < n:
            # pre-padded wave: trailing rows target the drop slot. Host
            # list extension only — no device ops.
            slot_ids = list(slot_ids) + [self.n_slots] * (n - n_real_req)
            budgets = list(budgets) + [0] * (n - n_real_req)
            if sampling is not None:
                sampling = list(sampling) + [None] * (n - n_real_req)
        if T > self.max_prompt_len:
            # a real request-contract error (not an assert: must survive -O
            # and produce an actionable message at the serving layer).
            # Checked against max_prompt_len itself, NOT max_len - max_new:
            # with spec_k the cache carries verification headroom that must
            # never be eaten by a longer prompt (a spec round writes
            # spec_k+1 fresh K/V before knowing how many commit).
            raise ValueError(
                f"prompt bucket {T} exceeds the decoder's max_prompt_len "
                f"{self.max_prompt_len}; raise max_prompt_len when "
                f"building the server/decoder"
            )
        # pad the wave to a power-of-two batch: admission compiles one XLA
        # program per (n, T), and warmup() pre-compiles exactly the pow2
        # sizes — arbitrary wave sizes would stall live traffic on fresh
        # compiles. Padded rows target slot id N (out of range): every
        # scatter uses mode="drop", so they write nowhere. (Serving waves
        # arrive pre-padded and skip this device-op path entirely, above.)
        n_real = n_real_req  # drop rows never reserve pages / write tables
        n_pad = 1
        while n_pad < n:
            n_pad *= 2
        if n_pad != n:
            reps = n_pad - n
            embeds = jnp.concatenate([embeds, jnp.tile(embeds[:1], (reps, 1, 1))])
            mask = jnp.concatenate([mask, jnp.tile(mask[:1], (reps, 1))])
            slot_ids = list(slot_ids) + [self.n_slots] * reps
            budgets = list(budgets) + [0] * reps
            n = n_pad
        extra = ()
        if self.paged:
            ps = self.page_size
            T_pages = -(-T // ps) * ps  # prompts pad up to a page multiple
            # Recycle the reused slots' pages (host mirror — page ownership
            # never needs a device read), then RESERVE each request's full
            # page need up front: prompt + its token budget. No mid-decode
            # allocation can then ever fail; pool pressure surfaces HERE,
            # where the scheduler can defer the wave (serve/server.py
            # catches MemoryError and retries at the next chunk boundary).
            # Freed pages may be re-allocated while done rows' device table
            # rows still reference them — harmless, done rows' decode
            # outputs are discarded (masked by `done`).
            self._free_rows(slot_ids[:n_real])
            n_data = T_pages // ps
            mp = self._host_table.shape[1]
            full_rows = np.zeros((n, mp), np.int32)
            try:
                for i, b in enumerate(budgets[:n_real]):  # padded rows: none
                    # + spec headroom: a speculative verification round
                    # writes spec_k+1 fresh K/V at the row's offset before
                    # knowing how many commit (mirrors max_len's headroom)
                    head = self.spec_k + 1 if self.spec_k else 0
                    need = pages_needed_for(T + min(b, self.max_new) + head, ps)
                    full_rows[i, :need] = self.allocator.alloc(need)
            except MemoryError:
                self.allocator.free(full_rows[full_rows != 0].tolist())
                raise
            self._host_table[np.asarray(slot_ids[:n_real])] = full_rows[:n_real]
            extra = (jnp.asarray(full_rows[:, :n_data]), jnp.asarray(full_rows))
        # per-request sampling params, padded to the wave (padded rows are
        # greedy: their scatters drop anyway). ONE admit program serves any
        # greedy/sampling mix — the params are traced inputs, not statics.
        from .sampling import pack_sampling_params

        packed = pack_sampling_params(
            list(sampling[:n_real]) if sampling is not None else None, n
        )
        if packed is None:
            rngs = np.zeros((n, 2), np.uint32)
            temps = np.zeros((n,), np.float32)
            top_ks = np.zeros((n,), np.int32)
            top_ps = np.ones((n,), np.float32)
        else:
            rngs, temps, top_ks, top_ps = packed
        fn = self._admit_fn(n, T)
        self.state = fn(
            self.params,
            self.state,
            embeds,
            mask,
            jnp.asarray(slot_ids, jnp.int32),
            jnp.asarray(np.minimum(budgets, self.max_new), jnp.int32),
            jnp.asarray(temps),
            jnp.asarray(top_ks),
            jnp.asarray(top_ps),
            jnp.asarray(rngs),
            *extra,
        )

    def _free_rows(self, rows) -> None:
        """Return ``rows``' pages to the allocator (host mirror only — the
        device table is overwritten on the next admit of each slot)."""
        for s in rows:
            held = self._host_table[s]
            self.allocator.free(held[held != 0].tolist())
            self._host_table[s] = 0

    def decode_chunk(self, k_steps: int = 8, return_flags: bool = False,
                     sync: bool = True, spec: bool = False):
        """Advance all live slots up to ``k_steps`` (early-exiting when every
        slot is idle). Paged capacity is fully reserved at admission
        (prompt + budget), so chunks never allocate — no mid-decode OOM by
        construction.

        ``spec=True`` (requires ``spec_k > 0``): each of the k_steps is a
        SPECULATIVE round — n-gram draft from the row's output history +
        one (spec_k+1)-token verification forward — committing 1+accepted
        tokens per round per live row. Greedy-only: the scheduler uses it
        when no sampling request is live (serve/server.py).

        ``return_flags=True``: the (done, budgets, n_emitted, tokens) state
        comes back as an OUTPUT of the same program in ONE device→host
        transfer — the scheduler loop then costs dispatch + one read per
        chunk instead of dispatch + a separate flag-stack program + token
        gathers (each host read is a ~100-200 ms RPC on remote backends)."""
        fn = (
            self._spec_chunk_fn(k_steps)
            if spec and self.spec_k > 0
            else self._chunk_fn(k_steps)
        )
        self.state, fused = fn(self.params, self.state)
        if not return_flags:
            return None
        if not sync:
            return fused  # device array; reader calls to_host_flags later —
            # lets a scheduler dispatch the NEXT chunk before paying the
            # read's RPC (depth-1 pipelining, serve/server.py)
        return self.to_host_flags(fused)

    @staticmethod
    def to_host_flags(fused):
        """Device fused block → writable host (done, budgets, n_emitted,
        tokens) tuple. Blocks until the producing chunk finishes."""
        host = np.array(fused)  # writable copy: admission mutates the flags
        return host[:, 0].astype(bool), host[:, 1], host[:, 2], host[:, 3:]

    def harvest(
        self,
        flags: Optional[Tuple[np.ndarray, ...]] = None,
    ) -> List[Tuple[int, np.ndarray, int]]:
        """(slot, tokens, n) for every finished row with pending output.
        Frees the slots (budget→0 marks them reusable). Pass ``flags`` from
        sync_flags() — or the 4-tuple from ``decode_chunk(return_flags=True)``,
        whose host token copy avoids any further device read here."""
        if flags is None:
            flags = self.sync_flags()
        done, budgets, counts_all = flags[0], flags[1], flags[2]
        tokens_host = flags[3] if len(flags) > 3 else None
        ready = np.nonzero(done & (budgets > 0))[0]
        if ready.size == 0:
            return []
        tokens = (
            tokens_host[ready]
            if tokens_host is not None
            else np.asarray(self.state.tokens[ready])
        )
        counts = counts_all[ready]
        if self.paged:
            # free finished rows' pages immediately — holding them until
            # slot REUSE exhausted the pool under load (found by driving
            # the full-size HTTP path, scripts/bench_serve.py --paged).
            # The DEVICE table rows zero inside the same jitted program as
            # the budget scatter: done slots keep writing their last K/V at
            # a fixed position every chunk (llama_forward has no per-row
            # active mask), so a stale table entry would let a finished
            # slot corrupt pages re-allocated to live requests; zeroed rows
            # sink those writes into the null page 0.
            self._free_rows(ready.tolist())
        self._release_rows(ready.tolist(), set_done=False)
        return [(int(s), tokens[i], int(counts[i])) for i, s in enumerate(ready)]

    def _release_rows(self, slot_ids: List[int], set_done: bool) -> None:
        """ONE jitted program per (set_done, pow2 size class): scatter
        budgets→0 (+done for cancel) and, paged, zero the rows' device
        page-table entries. Replaces what used to be up to three separate
        eager scatters per harvest/cancel — each eager op is a fresh
        compile per distinct id-count and a ~100-200 ms dispatch on
        remote-attached backends (CLAUDE.md)."""
        n = 1
        while n < len(slot_ids):  # pad to pow2: one compile per size class
            n *= 2
        ids = list(slot_ids) + [self.n_slots] * (n - len(slot_ids))
        key = bool(set_done)
        if key not in self._release_fns:
            paged = self.paged

            @self._jit_state_fn
            def fn(params, state: SlotState, ids):
                upd = dict(budgets=state.budgets.at[ids].set(0, mode="drop"))
                if set_done:
                    upd["done"] = state.done.at[ids].set(True, mode="drop")
                if paged:
                    upd["cache"] = state.cache._replace(
                        page_table=state.cache.page_table.at[ids].set(
                            0, mode="drop"
                        )
                    )
                return state._replace(**upd)

            self._release_fns[key] = fn
        self.state = self._release_fns[key](
            self.params, self.state, jnp.asarray(ids, jnp.int32)
        )

    def live_count(self, done: Optional[np.ndarray] = None) -> int:
        if done is None:
            done = np.asarray(self.state.done)
        return int(np.sum(~done))

    def cancel(self, slot_ids: List[int]) -> None:
        """Release ``slot_ids`` immediately (client disconnected / deadline
        passed): mark them done with NO pending output (budgets→0, so
        harvest skips them and free_slots offers them for re-admission)
        and, when paged, return their pages to the pool right away. One
        tiny jitted scatter. Safe at any chunk boundary: an in-flight
        decode chunk treats the rows as done-row no-ops, and a stale flag
        read that still shows them live harvests into a popped request
        (the scheduler's staleness guard / req-is-None path,
        serve/server.py::_loop)."""
        if not slot_ids:
            return
        if self.paged:
            # free the host-mirror pages; the DEVICE table rows zero inside
            # the same jitted program as the flag scatter below (done rows
            # keep writing their last K/V each chunk; a stale entry would
            # corrupt re-allocated pages — see harvest()).
            self._free_rows(list(slot_ids))
        self._release_rows(list(slot_ids), set_done=True)

    # ------------------------------------------------------------------

    def _admit_fn(self, n: int, T: int):
        if self.paged:
            return self._admit_fn_paged(n, T)
        key = (n, T)
        if key not in self._admit_fns:
            cfg, eos, max_new = self.cfg, self.eos_id, self.max_new
            attn_impl = self._attn_impl
            tp_mesh = self._tp_mesh

            @self._jit_state_fn
            def fn(params, state: SlotState, embeds, mask, slot_ids, budgets,
                   temps, top_ks, top_ps, rngs):
                from .sampling import sample_rows

                tmp = init_kv_cache(cfg, n, T, dtype=self.cache_dtype)
                out = llama_forward(
                    params, cfg, attn_impl=attn_impl, tp_mesh=tp_mesh,
                    inputs_embeds=embeds, attn_mask=mask,
                    kv_cache=tmp, cache_offset=jnp.int32(0),
                    last_logit_only=True,
                )
                # the first token draws at the row's UNPADDED position
                # lens-1 (decode steps fold lens, lens+1, ... — no key
                # collision, and the stream is independent of the wave's
                # padded bucket: a seeded request replays identically in
                # any batch composition)
                lens = jnp.sum(mask.astype(jnp.int32), axis=1)
                pads = (T - lens).astype(jnp.int32)
                first = sample_rows(
                    out.logits[:, -1], rngs,
                    (lens - 1).astype(jnp.int32), temps, top_ks, top_ps,
                )
                tmpc = out.kv_cache

                cache = state.cache
                new_cache = KVCache(
                    cache.k.at[:, slot_ids, :, :T, :].set(tmpc.k, mode="drop"),
                    cache.v.at[:, slot_ids, :, :T, :].set(tmpc.v, mode="drop"),
                    None
                    if cache.k_scale is None
                    else cache.k_scale.at[:, slot_ids, :, :T].set(tmpc.k_scale, mode="drop"),
                    None
                    if cache.v_scale is None
                    else cache.v_scale.at[:, slot_ids, :, :T].set(tmpc.v_scale, mode="drop"),
                )
                row_tokens = jnp.full((n, max_new), eos, jnp.int32).at[:, 0].set(first)
                done0 = (first == eos) | (budgets <= 1)
                return SlotState(
                    cache=new_cache,
                    pad_lens=state.pad_lens.at[slot_ids].set(pads, mode="drop"),
                    offsets=state.offsets.at[slot_ids].set(T, mode="drop"),
                    last_token=state.last_token.at[slot_ids].set(first, mode="drop"),
                    done=state.done.at[slot_ids].set(done0, mode="drop"),
                    tokens=state.tokens.at[slot_ids].set(row_tokens, mode="drop"),
                    n_emitted=state.n_emitted.at[slot_ids].set(1, mode="drop"),
                    budgets=state.budgets.at[slot_ids].set(budgets, mode="drop"),
                    seen=_seed_seen(state.seen, slot_ids, first),
                    rng=state.rng.at[slot_ids].set(rngs, mode="drop"),
                    temps=state.temps.at[slot_ids].set(temps, mode="drop"),
                    top_ks=state.top_ks.at[slot_ids].set(top_ks, mode="drop"),
                    top_ps=state.top_ps.at[slot_ids].set(top_ps, mode="drop"),
                )

            self._admit_fns[key] = fn
        return self._admit_fns[key]

    def _admit_fn_paged(self, n: int, T: int):
        """Paged admission: dense temp-cache prefill (the prefill kernel
        path is untouched), then ONE batched scatter of all n sequences'
        K/V into their pages (infer/paged.py::write_prefill_pages_batch)."""
        key = ("paged", n, T)
        if key not in self._admit_fns:
            cfg, eos, max_new = self.cfg, self.eos_id, self.max_new
            attn_impl = self._attn_impl
            tp_mesh = self._tp_mesh

            @self._jit_state_fn
            def fn(params, state: SlotState, embeds, mask, slot_ids, budgets,
                   temps, top_ks, top_ps, rngs, pages, full_rows):
                from .paged import write_prefill_pages_batch
                from .sampling import sample_rows

                tmp = init_kv_cache(cfg, n, T, dtype=self.cache_dtype)
                out = llama_forward(
                    params, cfg, attn_impl=attn_impl, tp_mesh=tp_mesh,
                    inputs_embeds=embeds, attn_mask=mask,
                    kv_cache=tmp, cache_offset=jnp.int32(0),
                    last_logit_only=True,
                )
                # the first token draws at the row's UNPADDED position
                # lens-1, matching the dense admit path above: a seeded
                # request replays identically in any bucket width, and the
                # draw never aliases a later decode step's RNG counter
                # (decode draws at offsets - pad_lens = lens, lens+1, ...)
                lens = jnp.sum(mask.astype(jnp.int32), axis=1)
                pads = (T - lens).astype(jnp.int32)
                first = sample_rows(
                    out.logits[:, -1], rngs,
                    (lens - 1).astype(jnp.int32), temps, top_ks, top_ps,
                )
                tmpc = out.kv_cache  # k/v: (L, n, Hkv, T, Dh)
                # buffers pad RIGHT up to a page multiple; the valid window
                # [pad, T) is unchanged, the tail slots are just never read
                ps = state.cache.page_size
                tail = (-T) % ps

                def padT(x):  # (L, n, Hkv, T, ...) → T padded to page multiple
                    widths = [(0, 0)] * x.ndim
                    widths[3] = (0, tail)
                    return jnp.pad(x, widths) if tail else x

                scales = (
                    dict(
                        k_scales=padT(tmpc.k_scale).transpose(0, 1, 3, 2),
                        v_scales=padT(tmpc.v_scale).transpose(0, 1, 3, 2),
                    )
                    if tmpc.quantized  # int8 temp cache: pass values+scales as-is
                    else {}
                )
                new_cache = write_prefill_pages_batch(
                    state.cache,
                    slot_ids,
                    pages,
                    padT(tmpc.k).transpose(0, 1, 3, 2, 4),  # (L, n, T', Hkv, Dh)
                    padT(tmpc.v).transpose(0, 1, 3, 2, 4),
                    pads,
                    **scales,
                )
                # real prompt length, not the page-padded buffer length; the
                # table row carries the FULL reservation (prompt + budget
                # pages) so decode appends always land on owned pages
                new_cache = new_cache._replace(
                    lengths=new_cache.lengths.at[slot_ids].set(T, mode="drop"),
                    page_table=new_cache.page_table.at[slot_ids].set(
                        full_rows, mode="drop"
                    ),
                )
                row_tokens = jnp.full((n, max_new), eos, jnp.int32).at[:, 0].set(first)
                done0 = (first == eos) | (budgets <= 1)
                return SlotState(
                    cache=new_cache,
                    pad_lens=state.pad_lens.at[slot_ids].set(pads, mode="drop"),
                    offsets=state.offsets.at[slot_ids].set(T, mode="drop"),
                    last_token=state.last_token.at[slot_ids].set(first, mode="drop"),
                    done=state.done.at[slot_ids].set(done0, mode="drop"),
                    tokens=state.tokens.at[slot_ids].set(row_tokens, mode="drop"),
                    n_emitted=state.n_emitted.at[slot_ids].set(1, mode="drop"),
                    budgets=state.budgets.at[slot_ids].set(budgets, mode="drop"),
                    seen=_seed_seen(state.seen, slot_ids, first),
                    rng=state.rng.at[slot_ids].set(rngs, mode="drop"),
                    temps=state.temps.at[slot_ids].set(temps, mode="drop"),
                    top_ks=state.top_ks.at[slot_ids].set(top_ks, mode="drop"),
                    top_ps=state.top_ps.at[slot_ids].set(top_ps, mode="drop"),
                )

            self._admit_fns[key] = fn
        return self._admit_fns[key]

    def _chunk_fn(self, k_steps: int):
        if k_steps not in self._chunk_fns:
            cfg, eos = self.cfg, self.eos_id
            attn_impl = self._attn_impl
            tp_mesh = self._tp_mesh
            N = self.n_slots

            paged = self.paged
            rep = self.repetition_penalty

            @functools.partial(self._jit_state_fn, extra_out=True)
            def fn(params, state: SlotState):
                def step(_, s: SlotState):
                    positions = (s.offsets - s.pad_lens)[:, None]
                    if paged:
                        out = llama_forward(
                            params, cfg, attn_impl=attn_impl, tp_mesh=tp_mesh,
                            input_ids=s.last_token[:, None],
                            # None licenses the fused paged kernel (the
                            # fresh token is always real on a decode step;
                            # the paged attention paths never consult the
                            # fresh mask anyway — paged_reference takes none)
                            attn_mask=None,
                            positions=positions,
                            # paged decode: the cache carries its own per-row
                            # lengths/pads (models/llama.py decode_paged)
                            kv_cache=s.cache._replace(
                                lengths=s.offsets, pad_lens=s.pad_lens
                            ),
                        )
                    else:
                        out = llama_forward(
                            params, cfg, attn_impl=attn_impl, tp_mesh=tp_mesh,
                            input_ids=s.last_token[:, None],
                            # None licenses the fused decode kernel (the
                            # fresh token is always real on a decode step)
                            attn_mask=None,
                            positions=positions,
                            kv_cache=s.cache,
                            cache_offset=s.offsets,  # per-row depths
                            kv_pad_lens=s.pad_lens,
                        )
                    logits = out.logits[:, 0]
                    if rep != 1.0:
                        pen = jnp.where(logits > 0, logits / rep, logits * rep)
                        logits = jnp.where(s.seen, pen, logits)
                    # lax.cond (real XLA If): an all-greedy batch — the
                    # common serving mix — skips the top-k sweep entirely,
                    # keeping the hot decode step at its current cost
                    nxt = jax.lax.cond(
                        jnp.any((s.temps > 0.0) & ~s.done),
                        lambda: _sample_rows(
                            logits, s.rng, s.offsets - s.pad_lens,
                            s.temps, s.top_ks, s.top_ps,
                        ),
                        lambda: jnp.argmax(logits, axis=-1).astype(jnp.int32),
                    )
                    nxt = jnp.where(s.done, jnp.int32(eos), nxt)
                    emit = ~s.done
                    # done rows' writes drop (row index pushed out of range)
                    # instead of gather-and-rewrite-the-old-value
                    tokens = s.tokens.at[
                        jnp.where(emit, jnp.arange(N), N),
                        jnp.minimum(s.n_emitted, s.tokens.shape[1] - 1),
                    ].set(nxt, mode="drop")
                    n_emitted = s.n_emitted + emit.astype(jnp.int32)
                    done = s.done | (nxt == eos) | (n_emitted >= s.budgets)
                    # done rows stop advancing: their cache slot is re-written
                    # in place, outside every live window
                    offsets = s.offsets + emit.astype(jnp.int32)
                    new_cache = out.kv_cache
                    if paged:  # keep pool lengths synced for grow_pages
                        new_cache = new_cache._replace(lengths=offsets)
                    seen = (
                        s.seen.at[jnp.arange(N), nxt].set(True)
                        if rep != 1.0
                        else s.seen
                    )
                    return SlotState(
                        cache=new_cache,
                        pad_lens=s.pad_lens,
                        offsets=offsets,
                        last_token=nxt,
                        done=done,
                        tokens=tokens,
                        n_emitted=n_emitted,
                        budgets=s.budgets,
                        seen=seen,
                        rng=s.rng,
                        temps=s.temps,
                        top_ks=s.top_ks,
                        top_ps=s.top_ps,
                    )

                # while_loop (not fori): a chunk whose rows ALL finish (EOS /
                # budget) mid-way stops early — with adaptive chunk lengths a
                # 64-step chunk must not burn 60 dead steps
                def cond(carry):
                    i, s = carry
                    return (i < k_steps) & ~jnp.all(s.done)

                def body(carry):
                    i, s = carry
                    return i + 1, step(i, s)

                _, new_state = jax.lax.while_loop(cond, body, (jnp.int32(0), state))
                # fused host block: flags + emitted tokens ride back as ONE
                # program output → the scheduler does a single host read per
                # chunk (harvest/_emit_partials consume the copy)
                fused = jnp.concatenate(
                    [
                        new_state.done.astype(jnp.int32)[:, None],
                        new_state.budgets[:, None],
                        new_state.n_emitted[:, None],
                        new_state.tokens,
                    ],
                    axis=1,
                )
                return new_state, fused

            self._chunk_fns[k_steps] = fn
        return self._chunk_fns[k_steps]

    def _spec_chunk_fn(self, k_steps: int):
        """Speculative decode chunk: ``k_steps`` ROUNDS (not tokens) of
        n-gram draft + one (spec_k+1)-token verification forward per round
        (infer/generate.py::speculative_generate is the one-shot sibling;
        reference decode loop: inference.py:55-74 has no such path).

        Slot-cache adaptation: unlike the engine path's uniform scalar
        offset + validity bitmask, every row writes its spec_k+1 fresh K/V
        at ITS OWN offset and advances the offset by the number of tokens
        it committed — the next round simply overwrites the rejected tail
        (slots outside [pad, offset) are never attended; for the paged
        cache the tail slots live on pages the row RESERVED at admission,
        so overwriting them in place needs no page lifecycle either —
        write_tokens routes each position through the row's table)."""
        key = ("spec", k_steps)
        if key not in self._chunk_fns:
            cfg, eos = self.cfg, self.eos_id
            attn_impl = self._attn_impl
            tp_mesh = self._tp_mesh
            N = self.n_slots
            K = self.spec_k
            paged = self.paged
            from .generate import _ngram_propose

            @functools.partial(self._jit_state_fn, extra_out=True)
            def fn(params, state: SlotState):
                def round_(_, s: SlotState):
                    draft = _ngram_propose(s.tokens, s.n_emitted, s.last_token, K)
                    seq = jnp.concatenate([s.last_token[:, None], draft], axis=1)
                    positions = (s.offsets - s.pad_lens)[:, None] + jnp.arange(
                        K + 1, dtype=jnp.int32
                    )[None, :]
                    # attn_mask=None: every fresh draft token is REAL (the
                    # implicit-mask contract) — this is what lets the dense
                    # branch take the fused multi-token kernel (round 5,
                    # models/llama.py decode_fused T>1); semantics are
                    # identical to the all-ones mask it defaults to.
                    if paged:
                        out = llama_forward(
                            params, cfg, attn_impl=attn_impl, tp_mesh=tp_mesh,
                            input_ids=seq,
                            attn_mask=None,
                            positions=positions,
                            # paged verification: cached window [pad, offset)
                            # + causal fresh block; write_tokens scatters the
                            # K+1 fresh K/V at offsets..offsets+K
                            kv_cache=s.cache._replace(
                                lengths=s.offsets, pad_lens=s.pad_lens
                            ),
                        )
                    else:
                        out = llama_forward(
                            params, cfg, attn_impl=attn_impl, tp_mesh=tp_mesh,
                            input_ids=seq,
                            attn_mask=None,
                            positions=positions,
                            kv_cache=s.cache,
                            cache_offset=s.offsets,  # per-row depths
                            kv_pad_lens=s.pad_lens,
                        )
                    preds = jnp.argmax(out.logits, axis=-1).astype(jnp.int32)
                    # the accept/commit contract (agreeing prefix + bonus,
                    # first-EOS truncation, budget caps) is SHARED with the
                    # engine's one-shot path — one copy of the math
                    from .generate import commit_verified_drafts

                    tokens, n_add, last, done, _ = commit_verified_drafts(
                        preds, draft, s.tokens, s.n_emitted, s.budgets,
                        s.done, s.last_token, eos,
                    )
                    n_emitted = s.n_emitted + n_add
                    # advancing by n_add keeps exactly the CONSUMED fed
                    # slots ([last, accepted drafts…]) inside the valid
                    # window; the rejected tail is overwritten next round
                    offsets = s.offsets + n_add
                    new_cache = out.kv_cache
                    if paged:  # keep pool lengths synced (as _chunk_fn does)
                        new_cache = new_cache._replace(lengths=offsets)
                    return s._replace(
                        cache=new_cache,
                        offsets=offsets,
                        last_token=last,
                        done=done,
                        tokens=tokens,
                        n_emitted=n_emitted,
                    )

                def cond(carry):
                    i, s = carry
                    return (i < k_steps) & ~jnp.all(s.done)

                def body(carry):
                    i, s = carry
                    return i + 1, round_(i, s)

                _, new_state = jax.lax.while_loop(cond, body, (jnp.int32(0), state))
                fused = jnp.concatenate(
                    [
                        new_state.done.astype(jnp.int32)[:, None],
                        new_state.budgets[:, None],
                        new_state.n_emitted[:, None],
                        new_state.tokens,
                    ],
                    axis=1,
                )
                return new_state, fused

            self._chunk_fns[key] = fn
        return self._chunk_fns[key]
