"""Serving stack: dynamic-batching engine + HTTP server.

The reference has no serving story — inference is a one-shot CLI over a
single file (reference: inference.py:140-178). For production TPU serving,
throughput comes from batching (PERF.md: decode cost is weight-read
dominated, so co-scheduled requests ride almost free). This module adds:

  * ``BatchingEngine`` — a dynamic batcher: concurrent requests queue up,
    a scheduler thread drains up to ``max_batch`` compatible requests
    (same endpoint kind / text prompt / token budget bucket) per engine
    call, amortizing one TPU program across all of them;
  * ``SummarizationServer`` — stdlib ThreadingHTTPServer exposing
      POST /v1/audio_summary   {"audio": [f32...] | "audio_b64": <i16 pcm>,
                                "sample_rate": 16000, "text_prompt": "",
                                "max_new_tokens": 128, "stream": false}
      POST /v1/text_response   {"text": "...", "max_new_tokens": 128,
                                "stream": false}
      GET  /healthz
    JSON in/out; audio is resampled host-side via the native frontend.
    ``"stream": true`` (continuous scheduler) returns chunked ndjson:
    {"delta": ...} per decode chunk, then {"done": true, "response": ...}.
"""

from __future__ import annotations

import base64
import json
import os
import queue
import threading
import time
from dataclasses import dataclass, field
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Any, Dict, List, Optional

import numpy as np


@dataclass
class _Request:
    kind: str  # "audio" | "text"
    payload: Any  # waveform np.ndarray | str
    text_prompt: str
    max_new_tokens: int
    event: threading.Event = field(default_factory=threading.Event)
    result: Optional[str] = None
    error: Optional[str] = None
    # streaming (continuous scheduler only): text deltas arrive on
    # ``partials`` after every decode chunk; None closes the stream
    stream: bool = False
    partials: "queue.Queue" = field(default_factory=queue.Queue)
    _sent: int = 0  # chars already streamed
    _admit_iter: int = -1  # scheduler iteration the request was admitted at
    # set when the requester gives up (submit timeout, streaming client
    # disconnect): the continuous scheduler releases the slot at the next
    # chunk boundary instead of decoding the rest of the budget for nobody
    cancelled: threading.Event = field(default_factory=threading.Event)
    # per-request sampling (either scheduler; infer/sampling.py):
    # temperature 0 = greedy; seed makes the draw reproducible
    temperature: float = 0.0
    top_k: int = 0
    top_p: float = 1.0
    seed: Optional[int] = None

    @property
    def sampling_tuple(self):
        if self.temperature <= 0.0:
            return None
        return (self.temperature, self.top_k, self.top_p,
                self.seed if self.seed is not None else 0)

    @property
    def group_key(self):
        # bucket token budgets so requests with similar budgets co-batch
        budget = ((self.max_new_tokens + 63) // 64) * 64
        return (self.kind, self.text_prompt, budget)


class BatchingEngine:
    """Dynamic batcher over an LLMSpeechTextInference engine."""

    def __init__(self, engine, max_batch: int = 32, max_wait_ms: float = 20.0):
        self.engine = engine
        self.max_batch = max_batch
        self.max_wait_s = max_wait_ms / 1000.0
        self._inflight = 0
        self._inflight_lock = threading.Lock()
        # incompatible requests popped during a drain park here and LEAD
        # the next wave — requeueing them at the back let a sustained
        # same-group stream starve a lone cross-group request forever
        # (only one thread runs waves, so no lock needed)
        self._carry: List[_Request] = []
        self._queue: "queue.Queue[_Request]" = queue.Queue()
        self._stop = threading.Event()
        self.batches_run = 0
        self.requests_served = 0
        self._thread = threading.Thread(target=self._loop, daemon=True)
        self._thread.start()

    def submit(self, req: _Request, timeout: float = 300.0) -> str:
        with self._inflight_lock:
            self._inflight += 1
        try:
            self._queue.put(req)
            if not req.event.wait(timeout):
                raise TimeoutError("generation timed out")
            if req.error:
                raise RuntimeError(req.error)
            return req.result  # type: ignore[return-value]
        finally:
            with self._inflight_lock:
                self._inflight -= 1

    def idle(self) -> bool:
        """True when no request is queued or mid-generate (drain probe)."""
        return self._inflight == 0 and self._queue.empty()

    def warmup(self, audio_seconds=(10.0,), budgets=None) -> None:
        """Compile every program shape live traffic can hit BEFORE serving
        (JetStream-style; the continuous scheduler has its own).

        Waves pad to power-of-two rows (engine._pad_batch), so the ladder
        walks each power of two up to ``_pad_batch(max_batch)`` — a
        non-power-of-two ``max_batch`` (e.g. 24) still produces full waves
        padded to the NEXT power (32), and that shape must be warm too.
        Arrival timing decides wave sizes under burst — a single full
        dummy wave only covers the sizes that race happened to produce,
        and every uncovered size pays a 20-40 s compile mid-traffic
        (measured: a 64-req burst at 2.6-4.9 req/s while compiling vs
        29-31 warm). Decode budgets all round up to the engine's decode
        bucket, so one budget per B covers every request asking
        <= decode_bucket tokens; pass ``budgets`` to pre-walk more of the
        ladder (e.g. the server's max_new_tokens cap). Coverage gaps, by
        design: greedy audio-only prompts — per-request sampling params
        are traced (first sampling request adds one compile per B), and
        text-kind / additional_text_prompt waves run separate prompt-build
        programs that compile on first live occurrence.
        """
        sr = self.engine.config.audio.sampling_rate
        if budgets is None:
            budgets = (self.engine.decode_bucket,)
        from ..infer.engine import _pad_batch

        ladder, b = [], 1
        while b <= _pad_batch(self.max_batch):
            ladder.append(b)
            b *= 2
        for secs in audio_seconds:
            wav = np.zeros(int(secs * sr), np.float32)
            for B in ladder:
                embeds, mask = self.engine.build_audio_prompt_batch([wav] * B)
                for budget in budgets:
                    self.engine._generate_from_embeds(embeds, mask, budget)

    def shutdown(self):
        self._stop.set()
        self._thread.join(timeout=5)

    # ------------------------------------------------------------------

    def _drain_compatible(self, first: _Request) -> List[_Request]:
        batch = [first]
        # same-group requests parked by earlier drains join first — they
        # arrived before anything still in the queue
        still: List[_Request] = []
        for r in self._carry:
            if len(batch) < self.max_batch and r.group_key == first.group_key:
                batch.append(r)
            else:
                still.append(r)
        self._carry = still
        deadline = time.monotonic() + self.max_wait_s
        while len(batch) < self.max_batch:
            remaining = deadline - time.monotonic()
            if remaining <= 0:
                break
            try:
                req = self._queue.get(timeout=remaining)
            except queue.Empty:
                break
            if req.group_key == first.group_key:
                batch.append(req)
            else:
                self._carry.append(req)
        return batch

    def _build_wave(self):
        """Drain one compatible wave off the queue and build its prompts
        (host upload + encoder + splice). Returns None when the queue stayed
        empty, or (batch, embeds_or_None, mask, budget, sampling, error).
        A build failure is carried in ``error`` so the LOOP fails exactly
        that wave's requests, never the scheduler thread."""
        if self._carry:
            first = self._carry.pop(0)  # parked cross-group request LEADS
        else:
            try:
                first = self._queue.get(timeout=0.1)
            except queue.Empty:
                return None
        batch = self._drain_compatible(first)
        budget = max(r.max_new_tokens for r in batch)
        # per-request sampling params are TRACED inputs of the generate
        # program (infer/generate.py::greedy_generate), so mixed
        # greedy/sampling batches share one compiled program; None
        # (all-greedy) keeps the speculative-decode fast path
        sampling = [r.sampling_tuple for r in batch]
        if all(s is None for s in sampling):
            sampling = None
        try:
            if first.kind == "text":
                embeds, mask = self.engine.build_text_prompt_batch(
                    [r.payload for r in batch]
                )
            else:
                embeds, mask = self.engine.build_audio_prompt_batch(
                    [r.payload for r in batch],
                    additional_text_prompt=first.text_prompt,
                )
        except Exception as e:  # noqa: BLE001 — fail the wave, not the loop
            return batch, None, None, budget, sampling, f"{type(e).__name__}: {e}"
        return batch, embeds, mask, budget, sampling, None

    def _loop(self):
        # depth-1 pipelining (same shape as the continuous scheduler's and
        # engine.generate_audio_response_batches'): wave i+1's prompt build
        # — host upload + encoder forward — runs on the builder thread
        # WHILE wave i's fused prefill+decode program occupies the chip, so
        # back-to-back waves stop paying build latency serially
        from concurrent.futures import ThreadPoolExecutor

        builder = ThreadPoolExecutor(max_workers=1)
        fut = None

        def finish(wave):
            batch, embeds, mask, budget, sampling, err = wave
            try:
                if err is None:
                    outs = self.engine._generate_from_embeds(
                        embeds, mask, budget, sampling=sampling
                    )[: len(batch)]
                    for r, out in zip(batch, outs):
                        r.result = out
                else:
                    for r in batch:
                        r.error = err
            except Exception as e:  # surface per-request
                for r in batch:
                    r.error = f"{type(e).__name__}: {e}"
            finally:
                self.batches_run += 1
                self.requests_served += len(batch)
                for r in batch:
                    r.event.set()

        try:
            while not self._stop.is_set():
                wave = fut.result() if fut is not None else self._build_wave()
                # prebuild ONLY when requests are already queued (deep-queue
                # regime: the next wave is full regardless, so snapshotting
                # it early costs nothing and hides its build under this
                # wave's generate). With an empty queue, prebuilding would
                # close the next wave's 20 ms drain window one generate
                # EARLY — a request arriving mid-generate would miss wave
                # i+1 and wait a full extra generate — so fall back to the
                # serial build-after-generate order instead.
                fut = (
                    builder.submit(self._build_wave)
                    if not self._queue.empty()
                    else None
                )
                if wave is not None:
                    finish(wave)
            # drain the in-flight prebuild so its requests don't hang on
            # their submit() timeout at shutdown
            if fut is not None:
                wave = fut.result()
                if wave is not None:
                    for r in wave[0]:
                        r.error = "server shutting down"
                        r.event.set()
        finally:
            builder.shutdown(wait=False)


class _SpecGovernor:
    """Adaptive speculative-chunk gating (host-side, zero device reads).

    A speculative round costs ~1.1-1.5× a plain decode step and pays for
    itself only when drafts get accepted (breakeven acceptance ~2-4% at
    the engine level, higher once scheduler overhead is counted —
    PERF.md "Speculative decoding"). Acceptance is a property of the
    WEIGHTS and the traffic (summaries repeat n-grams; random weights do
    not), so the scheduler measures it live: each spec chunk's per-row
    emitted-token delta beyond one-per-round is the accepted-draft bonus.
    Below ``threshold`` the scheduler demotes to plain chunks and
    re-probes with a spec chunk every ``probe_every`` chunks in case the
    traffic changed."""

    def __init__(self, spec_k: int, threshold: float = 0.05,
                 probe_every: int = 32, ema_decay: float = 0.7):
        self.spec_k = spec_k
        self.threshold = threshold
        self.probe_every = probe_every
        self.ema_decay = ema_decay
        self.acceptance = 3.0 * threshold  # optimistic start: try spec first
        self._chunks_since_probe = 0

    def want_spec(self) -> bool:
        if self.acceptance >= self.threshold:
            return True
        self._chunks_since_probe += 1
        if self._chunks_since_probe >= self.probe_every:
            self._chunks_since_probe = 0
            return True
        return False

    def observe(self, rounds: int, deltas) -> None:
        """``deltas``: emitted-token deltas across ONE spec chunk of
        ``rounds`` rounds, for rows live both before and after it (such
        rows ran every round and committed ≥1 token per round, so
        delta ≥ rounds and the excess is accepted drafts)."""
        if not deltas or rounds <= 0:
            return
        bonus = [
            max(0.0, d - rounds) / (rounds * self.spec_k) for d in deltas
        ]
        m = sum(bonus) / len(bonus)
        self.acceptance = (
            self.ema_decay * self.acceptance + (1.0 - self.ema_decay) * m
        )


class ContinuousBatchingEngine:
    """Decode-step-level continuous batching (VERDICT r1 #5).

    Unlike ``BatchingEngine`` (request-level: a batch holds every member to
    the longest token budget), this scheduler runs a persistent slot-based
    decoder (infer/slots.py): new requests are admitted into free KV-cache
    slots BETWEEN decode chunks, and rows that hit EOS or their budget are
    harvested and returned immediately — a short request co-batched with a
    long one returns as soon as ITS tokens are done.
    """

    def __init__(
        self,
        engine,
        n_slots: int = 32,
        chunk_steps: int = 16,
        max_prompt_len: int = 512,
        max_new_tokens: int = 256,
        max_admit: int = 8,
        admit_wait_ms: float = 100.0,
        paged: bool = False,
        max_chunk_steps: int = 64,
        num_pages: Optional[int] = None,
        spec_k: int = 0,
    ):
        import jax.numpy as jnp

        from ..infer.slots import SlotDecoder

        self.engine = engine
        # graceful demotion, matching the engine's own speculative gate
        # (infer/engine.py silently disables spec under a repetition
        # penalty): a CLI combo like --speculative_k with
        # --repetition_penalty must keep serving, not die on SlotDecoder's
        # (correct) library-contract ValueError. spec x paged composes
        # (paged verification forwards + write_tokens, infer/slots.py).
        rep = getattr(engine, "repetition_penalty", 1.0)
        if spec_k > 0 and rep != 1.0:
            print(
                "speculative chunks disabled: incompatible with "
                f"repetition_penalty={rep}"
            )
            spec_k = 0
        self.chunk_steps = chunk_steps
        # adaptive ceiling (_pick_chunk): chunks grow toward this by powers
        # of two when no stream/admission wants a near boundary
        self.max_chunk_steps = max(max_chunk_steps, chunk_steps)
        self.max_admit = min(max_admit, n_slots)  # a wave must fit the slots
        self.admit_wait_s = admit_wait_ms / 1000.0
        self.decoder = SlotDecoder(
            engine.llm_params,
            engine.llm_cfg,
            eos_id=engine.tokenizer.eos_id,
            n_slots=n_slots,
            max_prompt_len=max_prompt_len,
            max_new_tokens=max_new_tokens,
            cache_dtype=engine.cache_dtype,
            repetition_penalty=getattr(engine, "repetition_penalty", 1.0),
            paged=paged,
            num_pages=num_pages,
            mesh=getattr(engine, "mesh", None),  # TP serving rides the
            # engine's mesh: params are already sharded, the decoder shards
            # its cache state to match (parallel/sharding.py)
            spec_k=spec_k,  # >0: all-greedy chunks run speculative rounds
            # (draft + one (k+1)-token verification forward per round) —
            # the scheduler falls back to plain chunks whenever a sampling
            # request is live (_loop)
        )
        # adaptive spec gating: measured live acceptance decides whether
        # spec chunks pay (below breakeven they are pure overhead — the
        # α≈0 serve bench measured −33% req/s, PERF.md)
        self.spec_governor = _SpecGovernor(spec_k) if spec_k > 0 else None
        self._spec_prev: Dict[int, tuple] = {}  # slot → (req, n_emitted)
        # LSS_SCHED_TRACE=1: one stderr line per scheduler iteration with
        # the phase walls (admit / chunk dispatch / fused read) plus one
        # per builder wave — the measurement tool behind PERF.md's serving
        # wall attribution, and the first thing to turn on when a serving
        # number drifts (host-side only; zero device work when off)
        self._trace = os.environ.get("LSS_SCHED_TRACE") == "1"
        self._queue: "queue.Queue[_Request]" = queue.Queue()
        self._prepared: "queue.Queue" = queue.Queue()
        self._pending_wave = None
        self._building = False  # builder popped requests it hasn't staged yet
        self._by_slot: Dict[int, _Request] = {}
        self._stop = threading.Event()
        self.batches_run = 0  # decode chunks run
        self.requests_served = 0
        self._builder = threading.Thread(target=self._build_loop, daemon=True)
        self._builder.start()
        self._thread = threading.Thread(target=self._loop, daemon=True)
        self._thread.start()

    def submit(self, req: _Request, timeout: float = 300.0) -> str:
        self._queue.put(req)
        if not req.event.wait(timeout):
            # nobody will read the result: release the request's slot at
            # the next chunk boundary (SlotDecoder.cancel) so the decode
            # capacity goes to live requests instead of a dead budget
            req.cancelled.set()
            raise TimeoutError("generation timed out")
        if req.error:
            raise RuntimeError(req.error)
        return req.result  # type: ignore[return-value]

    def idle(self) -> bool:
        """True when nothing is queued, mid-build, staged, or decoding
        (drain probe). ``_building`` covers the blind window where the
        builder thread has popped requests off the queue but not yet put
        their wave in ``_prepared``."""
        return (
            not self._building
            and self._queue.empty()
            and self._prepared.qsize() == 0
            and self._pending_wave is None
            and not self._by_slot
        )

    def warmup(self, audio_seconds=(10.0,), timeout: float = 600.0) -> None:
        """Pre-compile every admission batch shape (standard TPU-serving
        practice — JetStream-style warmup). Admission waves admit whatever
        fits the free slots, so under real load EVERY power-of-two prompt/
        prefill shape up to max_admit eventually occurs; without warmup each
        first occurrence stalls live traffic for an XLA compile (~20-40 s
        on a tunneled backend). Dummy requests run through the REAL queue so
        there is no racing with the scheduler thread."""
        sr = self.engine.config.audio.sampling_rate
        if isinstance(audio_seconds, (int, float)):
            audio_seconds = (float(audio_seconds),)
        n = 1
        sizes = []
        while n <= self.max_admit:
            sizes.append(n)
            n *= 2
        # admission waves pad to power-of-two batches (infer/slots.py), so
        # these sizes × the given audio buckets are ALL the shapes live
        # traffic can produce — pass every prompt-length bucket your
        # traffic profile hits
        # freeze the governor across ALL warmup traffic: budget-2 dummy
        # rows finish after one round, so their observe() deltas read as
        # acceptance ≈ 0 and four waves of EMA decay would demote spec
        # before live traffic ever arrives — warmup must compile shapes,
        # not vote on acceptance
        gov = self.spec_governor
        if gov is not None:
            saved = (gov.acceptance, gov.probe_every)
        try:
            for sec in audio_seconds:
                wav = np.zeros(int(sec * sr), np.float32)
                for size in sizes:
                    reqs = [
                        _Request(kind="audio", payload=wav, text_prompt="",
                                 max_new_tokens=2)
                        for _ in range(size)
                    ]
                    threads = [
                        threading.Thread(
                            target=lambda r=r: self.submit(r, timeout=timeout)
                        )
                        for r in reqs
                    ]
                    for t in threads:
                        t.start()
                    for t in threads:
                        t.join()
            # chunk-program warmup: the budget-2 waves above never grow the
            # adaptive chunk size (remaining budget caps it at base), so the
            # k=32/64 plain-chunk programs would compile under LIVE traffic.
            # One full-budget request walks the whole growth ladder; the
            # spec shape (if any) was compiled by the waves above. Force
            # plain chunks for this request.
            if gov is not None:
                gov.acceptance, gov.probe_every = 0.0, 10**9
            wav = np.zeros(int(float(audio_seconds[0]) * sr), np.float32)
            self.submit(
                _Request(kind="audio", payload=wav, text_prompt="",
                         max_new_tokens=self.decoder.max_new),
                timeout=timeout,
            )
        finally:
            if gov is not None:
                gov.acceptance, gov.probe_every = saved
                gov._chunks_since_probe = 0

    def shutdown(self):
        self._stop.set()
        self._builder.join(timeout=5)
        self._thread.join(timeout=5)

    # ------------------------------------------------------------------

    def _build_loop(self):
        """Builder thread: coalesce raw requests into waves and run the
        prompt builders (host upload + audio encoder) OFF the scheduler
        thread, so the NEXT wave's upload overlaps the CURRENT wave's
        decode chunks (on a tunneled backend the upload is ~1 s — fully
        hideable). Waves coalesce up to ``admit_wait_ms``: tiny waves would
        each pay a prompt build and, once per distinct power-of-two batch
        shape, an XLA compile.
        """
        while not self._stop.is_set():
            try:
                first = self._queue.get(timeout=0.05)
            except queue.Empty:
                continue
            self._building = True  # visible to idle(): popped but not yet
            try:                   # in _prepared/_by_slot (drain blind spot)
                self._build_pending(first)
            finally:
                self._building = False

    def _build_pending(self, first: _Request):
            """One coalesced build pass (split out of _build_loop so the
            in-progress window is bracketed by ``_building``)."""
            pending = [first]
            deadline = time.monotonic() + self.admit_wait_s
            while len(pending) < self.max_admit:
                remaining = deadline - time.monotonic()
                if remaining <= 0:
                    break
                try:
                    pending.append(self._queue.get(timeout=remaining))
                except queue.Empty:
                    break
            # reject over-budget requests explicitly — the decoder's token
            # buffer is sized at construction, and silently clamping (the
            # old behavior) truncated responses with no indication
            ok = []
            for r in pending:
                if r.cancelled.is_set():
                    # requester already gave up while queued (submit
                    # timeout / disconnect): don't build or admit it
                    r.event.set()
                    continue
                if r.max_new_tokens < 1 or r.max_new_tokens > self.decoder.max_new:
                    # <1 would admit a budget-0 slot that is done but never
                    # harvested (harvest requires budgets>0) — a permanent
                    # slot leak; >budget would silently truncate
                    r.error = (
                        f"max_new_tokens {r.max_new_tokens} outside this "
                        f"server's budget [1, {self.decoder.max_new}]"
                    )
                    if r.stream:
                        r.partials.put(None)
                    r.event.set()
                else:
                    ok.append(r)
            pending = ok
            if not pending:
                return
            groups: Dict[Any, List[_Request]] = {}
            for r in pending:
                groups.setdefault((r.kind, r.text_prompt), []).append(r)
            for (kind, text_prompt), reqs in groups.items():
                try:
                    t_build0 = time.monotonic()
                    if kind == "text":
                        embeds, mask = self.engine.build_text_prompt_batch(
                            [r.payload for r in reqs]
                        )
                    else:
                        embeds, mask = self.engine.build_audio_prompt_batch(
                            [r.payload for r in reqs], additional_text_prompt=text_prompt
                        )
                    # builders pad B up to a power of two; pass the padded
                    # buffers through UNSLICED (rows beyond len(reqs) are
                    # admit()'s drop-slot padding). Slicing here and
                    # re-padding in admit cost per-wave-size eager device
                    # ops — each distinct real count was a fresh mid-wave
                    # XLA compile that warmup's exact-pow2 ladder never
                    # covers (measured 4.5-5.5 s admit stalls, PERF.md r5).
                    self._prepared.put((embeds, mask, reqs))
                    if self._trace:
                        import sys as _sys

                        print(
                            f"[build] wave n={len(reqs)} kind={kind} "
                            f"wall={time.monotonic() - t_build0:.3f}s",
                            file=_sys.stderr, flush=True,
                        )
                except Exception as e:  # surface per-request
                    for r in reqs:
                        r.error = f"{type(e).__name__}: {e}"
                        if r.stream:
                            r.partials.put(None)
                        r.event.set()

    def _admit_wave(self, flags):
        """Scatter prepared waves into free slots (prefill only — prompts
        were built by the builder thread). ``flags`` is the host copy from
        sync_flags()/decode_chunk; admission makes no device reads of its
        own and updates the copy in place so _pick_chunk sees the freshly
        admitted rows' budgets."""
        done, budgets, counts = flags[0], flags[1], flags[2]
        while True:
            if self._pending_wave is None:
                try:
                    self._pending_wave = self._prepared.get_nowait()
                except queue.Empty:
                    return
            embeds, mask, reqs = self._pending_wave
            if all(r.cancelled.is_set() for r in reqs):
                # every requester gave up while the wave waited (e.g. a
                # deferred wave whose clients hit their submit timeouts):
                # admitting it would block head-of-line admission on
                # len(reqs) simultaneous slots and burn prefill+decode for
                # nobody. (Partially-cancelled waves still admit whole —
                # the dead-sweep reclaims those rows one chunk later.)
                for r in reqs:
                    if r.stream:
                        r.partials.put(None)
                    r.event.set()
                self._pending_wave = None
                continue
            free = [s for s in self.decoder.free_slots(done) if s not in self._by_slot]
            if len(free) < len(reqs):
                return  # wait for slots to free up; decode keeps running
            slots = free[: len(reqs)]
            try:
                self.decoder.admit(
                    embeds, mask, slots, [r.max_new_tokens for r in reqs],
                    sampling=[r.sampling_tuple for r in reqs],
                )
                for s, r in zip(slots, reqs):
                    self._by_slot[s] = r
                    r._admit_iter = self._iter
                    # mirror into the host flag copy (the device state is
                    # ahead of it now): _pick_chunk must see these budgets
                    done[s] = False
                    budgets[s] = min(r.max_new_tokens, self.decoder.max_new)
                    counts[s] = 1
                    if self.spec_governor is not None:
                        # seed the acceptance snapshot at admission
                        # (n_emitted is 1 post-prefill) so requests that
                        # finish within their FIRST chunk still get
                        # observed by the governor
                        self._spec_prev[s] = (r, 1)
            except MemoryError as e:
                # paged pool full: admission reserves each request's whole
                # page need up front, so pressure surfaces here — defer the
                # wave until harvested rows free pages (next chunk boundary)
                if self._by_slot:
                    return
                if len(reqs) > 1:
                    # empty pool but a whole-wave reservation overflows it:
                    # split — admit the half that fits now, re-queue the
                    # rest behind it (admit() rolled its allocations back).
                    # Found live: warmup's max_admit-wide wave failed ALL
                    # its requests on a pool that held 3 of the 4 fine.
                    k = len(reqs) // 2
                    self._prepared.put((embeds[k:], mask[k:], reqs[k:]))
                    self._pending_wave = (embeds[:k], mask[:k], reqs[:k])
                    continue
                # a SINGLE request that cannot fit an empty pool will never
                # fit: fail it rather than deadlock
                for r in reqs:
                    r.error = f"MemoryError: {e}"
                    if r.stream:
                        r.partials.put(None)
                    r.event.set()
                self._pending_wave = None
                return
            except Exception as e:
                for r in reqs:
                    r.error = f"{type(e).__name__}: {e}"
                    if r.stream:
                        r.partials.put(None)
                    r.event.set()
            self._pending_wave = None

    def _pick_chunk(self, flags) -> int:
        """Adaptive chunk length. Base ``chunk_steps`` keeps boundaries
        close when responsiveness matters (live streams wanting deltas, or
        queued/prepared waves wanting admission); otherwise grow by powers
        of two up to the minimum remaining budget among live rows — a batch
        of all-long requests then pays ONE dispatch for what used to be
        four, and the in-chunk all-done early exit (infer/slots.py) bounds
        the waste if a row EOSes early. Power-of-two multiples only, so the
        set of compiled chunk programs stays logarithmic."""
        done, budgets, counts = flags[0], flags[1], flags[2]
        live = (~done) & (budgets > 0)
        if not live.any():
            return self.chunk_steps
        if any(r.stream for r in self._by_slot.values()):
            return self.chunk_steps
        if (
            self._pending_wave is not None
            or not self._prepared.empty()
            or not self._queue.empty()
        ):
            return self.chunk_steps
        remaining = int((budgets - counts)[live].min())
        k = self.chunk_steps
        while k * 2 <= remaining and k * 2 <= self.max_chunk_steps:
            k *= 2
        return k

    def _loop(self):
        # Depth-1 pipelined scheduler: decode_chunk returns the fused
        # (done, budgets, n_emitted, tokens) block as a program OUTPUT, and
        # the loop dispatches chunk i+1 (steered by an optimistic host
        # mirror of the flags) BEFORE paying chunk i's read — the ~100-200
        # ms host-read RPC (PERF.md) rides under device compute. The mirror
        # advances budget-bound; EOS-early rows reconcile at the read (one
        # extra dispatched chunk at worst, in which done rows are no-ops).
        tok = self.engine.tokenizer
        flags = None  # host mirror the scheduler acts on
        pending = None  # (device fused block, dispatch iteration) — unread
        self._iter = 0
        self._cancelled_at: Dict[int, int] = {}  # slot → iter it was cancelled
        self._loop_errors = 0
        while not self._stop.is_set():
            try:
                flags, pending = self._loop_iteration(tok, flags, pending)
            except Exception as e:  # noqa: BLE001 — keep the scheduler alive
                # one transient device/RPC error must not wedge the server
                # with /healthz green: fail every in-flight request loudly,
                # release their slots, and resume from a clean resync.
                import traceback as _tb

                _tb.print_exc()
                self._loop_errors += 1
                live = list(self._by_slot.items())
                self._by_slot.clear()
                self._pending_wave = None
                for s, r in live:
                    r.error = f"scheduler error: {type(e).__name__}: {e}"
                    if r.stream:
                        r.partials.put(None)
                    r.event.set()
                try:
                    if live:
                        self.decoder.cancel([s for s, _ in live])
                except Exception:  # noqa: BLE001 — device may still be sick
                    pass
                flags = None
                pending = None
                self._spec_prev = {}
                time.sleep(0.1)

    def _loop_iteration(self, tok, flags, pending):
        """One scheduler iteration (split out of _loop so a transient
        device/RPC failure is survivable). Returns the updated
        (flags, pending) mirror state."""
        self._iter += 1
        t_iter0 = time.monotonic()
        if flags is None:
            flags = self.decoder.sync_flags()
        # release cancelled requests' slots BEFORE admission so freed
        # slots (and, paged, their pages) are reusable this iteration
        dead = [
            s for s, r in self._by_slot.items() if r.cancelled.is_set()
        ]
        if dead:
            self.decoder.cancel(dead)
            for s in dead:
                r = self._by_slot.pop(s)
                self._cancelled_at[s] = self._iter
                flags[0][s] = True  # mirror: free + nothing to harvest
                flags[1][s] = 0
                if r.stream:
                    r.partials.put(None)
                r.event.set()
        t_admit0 = time.monotonic()
        self._admit_wave(flags)
        t_admit = time.monotonic() - t_admit0
        t_disp = 0.0
        k = 0
        if self._by_slot:
            k = self._pick_chunk(flags)
            # speculative chunks verify exact greedy streams — only
            # when every live request is greedy (sampling rows need the
            # per-token RNG path) AND the governor's measured live
            # acceptance says the verification rounds pay (it demotes
            # to plain chunks below breakeven, probing periodically)
            spec = (
                self.decoder.spec_k > 0
                and all(
                    r.sampling_tuple is None
                    for r in self._by_slot.values()
                )
                and self.spec_governor.want_spec()
            )
            if spec:
                # ONE spec program shape: every (spec, k) pair is its
                # own XLA compile, so letting probes ride the adaptive
                # chunk sizes compiled fresh 20-40 s programs MID-WAVE
                # (measured: 3.5 req/s vs 7.6 plain). Spec rounds
                # commit multiple tokens anyway, so the base chunk
                # already covers the budget a grown plain chunk would.
                k = self.chunk_steps
            t_disp0 = time.monotonic()
            dev = (
                self.decoder.decode_chunk(
                    k, return_flags=True, sync=False, spec=spec
                ),
                self._iter,
                spec,
                k,
            )
            t_disp = time.monotonic() - t_disp0
            self.batches_run += 1
            # optimistic mirror advance (budget-bound progression)
            done, budgets, counts = flags[0], flags[1], flags[2]
            act = (~done) & (budgets > 0)
            counts[act] = np.minimum(counts[act] + k, budgets[act])
            done |= (budgets > 0) & (counts >= budgets)
        else:
            dev = None
        t_read = 0.0
        if pending is not None:
            fused, dispatch_iter, was_spec, k_disp = pending
            t_read0 = time.monotonic()
            actual = self.decoder.to_host_flags(fused)
            t_read = time.monotonic() - t_read0
            # STALENESS GUARD: `actual` reflects a chunk dispatched at
            # dispatch_iter — BEFORE any harvest/admission issued since.
            # A slot harvested then re-admitted in between still shows
            # its OLD request ready in `actual`; harvesting it would
            # hand the new request stale tokens AND zero its budget.
            # Mask such slots out of this read; their real state comes
            # back in the next chunk's flags.
            # (admission at iteration j precedes that iteration's chunk
            # dispatch, so == dispatch_iter is FRESH; only later admits
            # are stale for this read)
            for s, r in self._by_slot.items():
                if r._admit_iter > dispatch_iter:
                    actual[1][s] = 0  # budgets=0 → harvest skips it
                    actual[0][s] = True  # and emit treats it as absent
            # same guard for CANCELLED slots: a chunk dispatched before
            # the cancel still shows the dead request ready — harvesting
            # it would double-free its pages and hand tokens to nobody.
            # A read dispatched at/after the cancel reflects budget=0,
            # so the entry can be dropped then.
            for s, it in list(self._cancelled_at.items()):
                if it > dispatch_iter:
                    actual[1][s] = 0
                    actual[0][s] = True
                else:
                    del self._cancelled_at[s]
            if self.spec_governor is not None:
                # measure live draft acceptance: rows live across the
                # whole spec chunk ran every round and committed ≥1
                # token per round — the excess is accepted drafts.
                # Rows that FINISHED inside the chunk (EOS/budget)
                # count too, as a lower bound (their delta may be
                # truncated): without them, all-short traffic whose
                # every request completes within one chunk would
                # never be observed and the governor could stay
                # frozen at its optimistic start. Identity (`is
                # prev_r`) excludes re-admitted and stale-masked
                # slots; cancelled rows were already popped.
                if was_spec:
                    deltas = [
                        int(actual[2][s]) - prev_n
                        for s, (prev_r, prev_n) in self._spec_prev.items()
                        if self._by_slot.get(s) is prev_r
                        and prev_r._admit_iter <= dispatch_iter
                    ]
                    self.spec_governor.observe(k_disp, deltas)
                new_prev = {}
                for s, r in self._by_slot.items():
                    if r._admit_iter > dispatch_iter:
                        # not reflected in this read — keep the
                        # admission-time seed for the next one
                        pv = self._spec_prev.get(s)
                        if pv is not None and pv[0] is r:
                            new_prev[s] = pv
                    elif not actual[0][s]:
                        new_prev[s] = (r, int(actual[2][s]))
                self._spec_prev = new_prev
            self._emit_partials(actual)
            for slot, tokens, n in self.decoder.harvest(actual):
                req = self._by_slot.pop(slot, None)
                # reconcile the mirror: harvested slots are free+spent
                flags[0][slot] = True
                flags[1][slot] = 0
                if req is None:
                    continue
                n = min(n, req.max_new_tokens)
                req.result = tok.decode(
                    tokens[:n].tolist(), skip_special_tokens=True
                )
                if req.stream:
                    tail = req.result[req._sent:]
                    if tail:
                        req.partials.put(tail)
                    req.partials.put(None)  # end-of-stream
                self.requests_served += 1
                req.event.set()
        if self._trace and (k or t_read or t_admit > 1e-3):
            import sys as _sys

            print(
                f"[sched] it={self._iter} live={len(self._by_slot)} k={k} "
                f"admit={t_admit:.3f}s dispatch={t_disp:.3f}s "
                f"read={t_read:.3f}s total={time.monotonic() - t_iter0:.3f}s",
                file=_sys.stderr, flush=True,
            )
        pending = dev
        if pending is None and not self._by_slot:
            # idle: the mirror is EXACT (harvest/cancel reconciled every
            # slot to done/budget-0), so keep it — re-nulling flags here
            # forced a ~100-200 ms sync_flags RPC per 2 ms spin, a busy
            # device hammer from an idle server. Sleep until admission
            # work appears.
            while (
                not self._stop.is_set()
                and self._prepared.qsize() == 0
                and self._pending_wave is None
            ):
                time.sleep(0.002)
        return flags, pending

    def _emit_partials(self, flags):
        """Stream text deltas for live streaming slots after each chunk.
        Token rows come from the fused host block decode_chunk returned
        (zero extra device reads); deltas re-detokenize the full prefix
        (cheap) and send the suffix beyond what the client already has."""
        live_streams = [
            (s, r) for s, r in self._by_slot.items() if r.stream and not flags[0][s]
        ]
        if not live_streams:
            return
        import numpy as np_  # local alias; numpy already imported module-level

        slots = [s for s, _ in live_streams]
        if len(flags) > 3:
            rows = flags[3][np_.asarray(slots)]
        else:
            rows = np_.asarray(self.decoder.state.tokens[np_.asarray(slots)])
        counts = flags[2]
        tok = self.engine.tokenizer
        for (s, r), row in zip(live_streams, rows):
            n = min(int(counts[s]), r.max_new_tokens)
            text = tok.decode(row[:n].tolist(), skip_special_tokens=True)
            if text.endswith("�"):
                # a chunk boundary split a multi-byte UTF-8 character: the
                # replacement char would change (in count and content) once
                # the character completes, desynchronizing the _sent char
                # offset — hold the delta until the prefix decodes cleanly
                continue
            if len(text) > r._sent:
                r.partials.put(text[r._sent:])
                r._sent = len(text)


def _decode_audio(body: Dict[str, Any], target_sr: int) -> np.ndarray:
    from ..data import native

    if "audio_b64" in body:
        pcm = np.frombuffer(base64.b64decode(body["audio_b64"]), np.int16)
        wav = native.pcm16_to_f32_mono(pcm)
    elif "audio" in body:
        wav = np.asarray(body["audio"], np.float32)
    else:
        raise ValueError("request needs 'audio' or 'audio_b64'")
    sr = int(body.get("sample_rate", target_sr))
    if sr != target_sr:
        wav = native.resample(wav, sr, target_sr)
    return wav


def _dispatch_latency_ms() -> float:
    """Measured device dispatch+read round-trip (ms). The continuous
    scheduler pays ~1 round-trip per chunk boundary against ~0.25-0.5 s of
    chunk compute; under ~100 ms that tax is noise and continuous batching
    wins or ties on throughput while adding per-class pacing + streaming
    (PERF.md serving table), while slower remote-dispatch tunnels hand the
    throughput edge back to the request-level batcher."""
    import time as _time

    import jax
    import jax.numpy as jnp

    f = jax.jit(lambda x: x + 1)
    x = jnp.zeros((8,), jnp.int32)
    np.asarray(f(x))  # compile + warm
    t0 = _time.monotonic()
    for _ in range(3):
        np.asarray(f(x))
    return (_time.monotonic() - t0) / 3 * 1000.0


class SummarizationServer:
    def __init__(self, engine, host: str = "127.0.0.1", port: int = 8080,
                 max_batch: int = 32, max_wait_ms: float = 20.0,
                 continuous="auto", n_slots: int = 32,
                 chunk_steps: int = 16, max_new_tokens: int = 256,
                 max_prompt_len: int = 512, paged: bool = False,
                 num_pages: Optional[int] = None, spec_k: int = 0,
                 admit_wait_ms: Optional[float] = None,
                 max_body_bytes: int = 64 * 1024 * 1024):
        # max_wait_ms tunes the REQUEST-LEVEL batcher's drain window;
        # admit_wait_ms (when given) tunes the continuous scheduler's
        # admission coalescing — they default independently because their
        # sweet spots differ ~5x (20 ms vs 100 ms).
        self.max_new_cap = max_new_tokens
        self.max_body_bytes = max_body_bytes
        # "auto" picks the scheduler by MEASURED dispatch latency instead of
        # hardcoding the fast one for one backend class (VERDICT r2 weak #1).
        # Threshold recalibrated in round 5 with the shape-closed admission
        # path (PERF.md "Floor analysis, round-5 revision"): the continuous
        # scheduler's only structural cost vs the request-level batcher is
        # ~1 dispatch+read round trip per chunk boundary against ~0.25-0.5 s
        # of chunk compute, so round trips under ~100 ms make it win or tie
        # on throughput (measured 23.9 vs 25.7 req/s burst at 26 ms) while
        # keeping per-class pacing and streaming; slower tunnels pay ≥⅓ of
        # each chunk in boundary tax and the fused-wave request-level
        # batcher returns. Pass True/False to force.
        if continuous == "auto":
            lat = _dispatch_latency_ms()
            continuous = lat < 100.0
            self.scheduler_reason = (
                f"auto: dispatch {lat:.1f} ms → "
                f"{'continuous' if continuous else 'request-level'}"
            )
        else:
            self.scheduler_reason = f"forced: continuous={bool(continuous)}"
        if continuous:
            extra = {} if admit_wait_ms is None else {"admit_wait_ms": admit_wait_ms}
            self.batcher = ContinuousBatchingEngine(
                engine, n_slots=n_slots, chunk_steps=chunk_steps,
                max_admit=max_batch, max_new_tokens=max_new_tokens,
                max_prompt_len=max_prompt_len, paged=paged,
                num_pages=num_pages, spec_k=spec_k, **extra,
            )
        else:
            self.batcher = BatchingEngine(engine, max_batch, max_wait_ms)
        self.target_sr = engine.config.audio.sampling_rate
        self._started = time.monotonic()
        self._draining = False
        outer = self

        self.warmup = getattr(self.batcher, "warmup", lambda **kw: None)

        class Handler(BaseHTTPRequestHandler):
            protocol_version = "HTTP/1.1"  # chunked streaming responses

            def log_message(self, fmt, *args):  # quiet
                pass

            def _stream(self, req: _Request):
                """Chunked ndjson: {"delta": ...} per decode chunk, then a
                final {"done": true, "response": ...} (or {"error": ...})."""
                self.send_response(200)
                self.send_header("Content-Type", "application/x-ndjson")
                self.send_header("Transfer-Encoding", "chunked")
                self.end_headers()

                def write(obj):
                    data = json.dumps(obj).encode() + b"\n"
                    self.wfile.write(
                        f"{len(data):x}\r\n".encode() + data + b"\r\n"
                    )
                    self.wfile.flush()

                # headers are out: from here on NO exception may escape to
                # do_POST's generic handler — it would write a second HTTP
                # status line into the open chunked body. Best effort: end
                # the stream with an error object, else just drop the
                # connection (the unterminated chunked body tells the
                # client the stream died).
                try:
                    while True:
                        piece = req.partials.get(timeout=600)
                        if piece is None:
                            break
                        write({"delta": piece})
                    req.event.wait(timeout=10)
                    if req.error:
                        write({"error": req.error})
                    else:
                        write({"done": True, "response": req.result})
                    self.wfile.write(b"0\r\n\r\n")
                    self.wfile.flush()
                except (BrokenPipeError, ConnectionResetError):
                    # client went away mid-stream: release the slot at the
                    # next chunk boundary instead of decoding for nobody
                    req.cancelled.set()
                except Exception as e:  # noqa: BLE001
                    try:
                        write({"error": f"{type(e).__name__}: {e}"})
                        self.wfile.write(b"0\r\n\r\n")
                        self.wfile.flush()
                    except Exception:  # noqa: BLE001
                        pass

            def _respond(self, code: int, obj: Dict[str, Any]):
                data = json.dumps(obj).encode()
                self.send_response(code)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(data)))
                self.end_headers()
                self.wfile.write(data)

            def do_GET(self):
                if self.path == "/healthz":
                    # 503 while draining: load balancers deroute the pod
                    # while in-flight requests finish
                    self._respond(503 if outer._draining else 200, {
                        "status": "draining" if outer._draining else "ok",
                        "batches_run": outer.batcher.batches_run,
                        "requests_served": outer.batcher.requests_served,
                    })
                elif self.path == "/metrics":
                    self._respond(200, outer.metrics())
                else:
                    self._respond(404, {"error": "not found"})

            def do_POST(self):
                if outer._draining:
                    self._respond(503, {"error": "server draining"})
                    return
                try:
                    length = int(self.headers.get("Content-Length", 0))
                    if length > outer.max_body_bytes:
                        # client-declared size; an unbounded read lets one
                        # oversized POST OOM the serving host
                        self._respond(413, {
                            "error": f"body {length} B exceeds the "
                                     f"{outer.max_body_bytes} B limit"
                        })
                        return
                    body = json.loads(self.rfile.read(length) or b"{}")
                    max_new = int(body.get("max_new_tokens", 128))
                    if not (1 <= max_new <= outer.max_new_cap):
                        # BOTH schedulers: the request-level batcher would
                        # otherwise size a KV cache (and compile a program)
                        # from an arbitrary client integer
                        self._respond(400, {
                            "error": f"max_new_tokens {max_new} outside "
                                     f"this server's budget "
                                     f"[1, {outer.max_new_cap}]"
                        })
                        return
                    if self.path == "/v1/text_response":
                        req = _Request("text", str(body["text"]), "", max_new)
                    elif self.path == "/v1/audio_summary":
                        wav = _decode_audio(body, outer.target_sr)
                        req = _Request(
                            "audio", wav, str(body.get("text_prompt", "")), max_new
                        )
                    else:
                        self._respond(404, {"error": "not found"})
                        return
                    # per-request sampling — supported by BOTH schedulers:
                    # params ride the decode programs as traced per-row
                    # inputs (infer/sampling.py), so any greedy/sampling mix
                    # shares one compiled program per shape bucket
                    temperature = float(body.get("temperature", 0.0))
                    if temperature > 0.0:
                        top_p = float(body.get("top_p", 1.0))
                        if not (0.0 < top_p <= 1.0):
                            self._respond(
                                400, {"error": f"top_p {top_p} outside (0, 1]"}
                            )
                            return
                        req.temperature = temperature
                        req.top_k = max(0, int(body.get("top_k", 0)))
                        req.top_p = top_p
                        # unseeded requests draw an independent seed — two
                        # identical prompts must not share a token stream
                        seed = body.get("seed")
                        req.seed = (
                            int(seed) if seed is not None
                            else int.from_bytes(os.urandom(4), "little")
                        )
                    # streaming rides the continuous scheduler's per-chunk
                    # partials; the request-level batcher has no mid-flight
                    # tokens, so it falls back to a single response
                    if body.get("stream") and isinstance(
                        outer.batcher, ContinuousBatchingEngine
                    ):
                        req.stream = True
                        outer.batcher._queue.put(req)
                        self._stream(req)
                        return
                    result = outer.batcher.submit(req)
                    self._respond(200, {"response": result})
                except TimeoutError as e:
                    # generation deadline (overload) — a gateway timeout,
                    # not a caller error: retry layers must see 5xx
                    self._respond(504, {"error": f"{type(e).__name__}: {e}"})
                except (KeyError, ValueError, TypeError,
                        json.JSONDecodeError) as e:
                    self._respond(400, {"error": f"{type(e).__name__}: {e}"})
                except RuntimeError as e:
                    # submit() re-wraps scheduler-side errors; ones rooted
                    # in a Value/KeyError are caller errors (e.g. a prompt
                    # bucket over the decoder's max_prompt_len), and a
                    # MemoryError surfacing here means the REQUEST can
                    # never fit the pool (transient pressure defers the
                    # wave instead of failing it) — also the caller's. The
                    # rest are server faults.
                    code = 400 if str(e).startswith(
                        ("ValueError", "KeyError", "MemoryError")
                    ) else 500
                    self._respond(code, {"error": f"{type(e).__name__}: {e}"})
                except Exception as e:  # noqa: BLE001 — server-side fault
                    self._respond(500, {"error": f"{type(e).__name__}: {e}"})

        # deep listen backlog: bursts of concurrent connections must queue,
        # not get RST (the stdlib default backlog of 5 drops load spikes).
        # Subclass-local so other ThreadingHTTPServers in-process keep
        # their own setting.
        class _Server(ThreadingHTTPServer):
            request_queue_size = 128

        self.httpd = _Server((host, port), Handler)

    def metrics(self) -> Dict[str, Any]:
        """Operational snapshot for scrapers/dashboards (GET /metrics):
        scheduler identity + why it was chosen, throughput counters, queue
        depths, and — under the continuous scheduler — slot occupancy and
        chunk sizing. All host-side state: zero device reads."""
        b = self.batcher
        out: Dict[str, Any] = {
            "scheduler": type(b).__name__,
            "scheduler_reason": self.scheduler_reason,
            "requests_served": b.requests_served,
            "batches_run": b.batches_run,
            "queue_depth": b._queue.qsize(),
            "uptime_s": round(time.monotonic() - self._started, 3),
        }
        if hasattr(b, "_loop_errors"):
            out["scheduler_loop_errors"] = b._loop_errors
        if isinstance(b, ContinuousBatchingEngine):
            out.update(
                live_slots=len(b._by_slot),
                n_slots=b.decoder.n_slots,
                prepared_waves=b._prepared.qsize(),
                chunk_steps=b.chunk_steps,
                max_chunk_steps=b.max_chunk_steps,
                paged=b.decoder.paged,
                spec_k=b.decoder.spec_k,
            )
            if b.spec_governor is not None:
                out["spec_acceptance"] = round(b.spec_governor.acceptance, 4)
                out["spec_active"] = (
                    b.spec_governor.acceptance >= b.spec_governor.threshold
                )
            if b.decoder.paged:
                out["free_pages"] = b.decoder.allocator.free_pages
                out["num_pages"] = b.decoder.num_pages
        return out

    @property
    def port(self) -> int:
        return self.httpd.server_address[1]

    def serve_forever(self):
        self.httpd.serve_forever()

    def start_background(self) -> threading.Thread:
        t = threading.Thread(target=self.httpd.serve_forever, daemon=True)
        t.start()
        return t

    def drain(self, timeout: float = 30.0, poll_s: float = 0.25) -> bool:
        """Graceful stop: refuse new requests (POSTs get 503, /healthz flips
        to 503 "draining" so load balancers deroute), wait for queued and
        in-flight work to finish, then shut down. Returns True if the
        scheduler went idle within ``timeout`` (False = deadline hit and
        remaining work was cut off by shutdown)."""
        self._draining = True
        deadline = time.monotonic() + timeout
        idle = getattr(self.batcher, "idle", lambda: True)
        drained = False
        streak = 0
        while time.monotonic() < deadline:
            # two consecutive idle observations: a single read can land in
            # the few-instruction window between a request leaving one
            # visible stage and entering the next
            streak = streak + 1 if idle() else 0
            if streak >= 2:
                drained = True
                break
            time.sleep(poll_s)
        self.shutdown()
        return drained

    def shutdown(self):
        self.httpd.shutdown()
        self.batcher.shutdown()


def serve(config, host: str = "0.0.0.0", port: int = 8080, warmup: bool = True,
          server_kwargs=None, drain_timeout: float = 30.0, **engine_kwargs):
    """Build an engine from config and serve until SIGTERM/SIGINT. ``warmup``
    pre-compiles every admission batch shape before accepting traffic (each
    first occurrence otherwise stalls live requests for an XLA compile).
    ``server_kwargs`` pass through to SummarizationServer (scheduler
    choice, slots, paged, budgets).

    Signals drain gracefully: new requests get 503, /healthz flips to 503
    so load balancers deroute, in-flight work finishes (up to
    ``drain_timeout`` seconds), then the process exits — preemption or a
    rolling deploy never cuts a response mid-stream, and the TPU claim is
    released promptly (an orphaned server blocks every other user of the
    chip)."""
    import signal

    from ..infer.engine import LLMSpeechTextInference

    engine = LLMSpeechTextInference(config, **engine_kwargs)
    server = SummarizationServer(engine, host=host, port=port,
                                 **(server_kwargs or {}))
    print(f"scheduler: {server.scheduler_reason}")
    if warmup:
        print("warming up (compiling admission shapes)...")
        server.warmup()

    def _on_signal(signum, frame):
        if server._draining:  # second signal: stop now
            threading.Thread(target=server.shutdown, daemon=True).start()
            return
        print(f"signal {signum}: draining (503 for new requests, "
              f"up to {drain_timeout:.0f}s for in-flight work)...")
        threading.Thread(
            target=server.drain, kwargs=dict(timeout=drain_timeout),
            daemon=True,
        ).start()

    signal.signal(signal.SIGTERM, _on_signal)
    signal.signal(signal.SIGINT, _on_signal)
    print(f"serving on {host}:{server.port}")
    server.serve_forever()  # returns when drain/shutdown completes
    print("drained, exiting")
