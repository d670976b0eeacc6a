"""Benchmark: batched audio-prompt inference throughput on one TPU chip.

Measures the product path (reference: inference.py:95-137): waveform →
HuBERT-large → pool projector → [prefix|audio|suffix] splice → Llama-3.2-3B
prefill + KV-cache greedy decode of 64 tokens, batched over 128 utterances of
10 s each. Random-init weights (no egress in this environment); throughput
is weight-independent.

Rounds run as ONE pipelined bulk stream (`generate_audio_response_batches`):
batch i+1's host upload + encoder forward overlaps batch i's prefill+decode
— the steady-state regime a sustained bulk workload sees; token streams are
identical to per-batch calls (tests/test_generate.py). The reported value
is BATCH / (wall / ROUNDS).

Failure taxonomy (VERDICT r3 #1) — two distinct failure modes, handled
differently:

1. **Backend unavailable at init** (the round-3 rc=124 cause: an orphaned
   claim on the shared tunneled chip). Engine rebuilds can never fix this,
   so it is detected FIRST with cheap subprocess probes (no engine, no
   model compile) retried under the wall deadline. If the backend never
   comes up, a structured JSON error line is emitted so the driver's
   artifact is informative instead of a bare timeout.
2. **Mid-run worker fault** ("kernel fault" after a successful init): the
   original taxonomy. Each retry rebuilds the engine from scratch (a crash
   invalidates all device state); after ATTEMPTS_WITH_FLASH failed attempts
   the Pallas encoder attention is gated off (LSS_ENCODER_FLASH=0) to
   isolate the suspect kernel.

A hard total-wall deadline (LSS_BENCH_DEADLINE seconds, default 480 — well
under the driver's 600 s timeout) bounds the whole run: every phase checks
remaining budget, and each in-process attempt runs under a SIGALRM watchdog
so a hung device call cannot eat the artifact. This also honors the
CLAUDE.md chip-claim rule: the process always exits on its own.

Baseline note: the reference publishes NO numbers (BASELINE.md). The
vs_baseline denominator is a documented estimate of the reference's
single-GPU (A100, fp16, bs=1, HF eager generate) rate on the same
workload: ~35 tok/s decode → ~1.9 s/utterance → ~0.53 utt/s.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...} on
success, or {"metric", "error", ...} if the backend was unavailable / all
attempts failed.
"""

from __future__ import annotations

import json
import os
import signal
import subprocess
import sys
import time
import traceback

import numpy as np

sys.path.insert(0, ".")
from llm_speech_summarization_tpu.utils.compile_cache import enable_compilation_cache

enable_compilation_cache()

BASELINE_UTT_PER_S = 0.53  # documented estimate, see module docstring

BATCH = 128
AUDIO_SECONDS = 10.0
MAX_NEW_TOKENS = 64
ROUNDS = 4  # one pipelined stream: the first batch's un-hidden upload amortizes over rounds
MAX_ATTEMPTS = 4
ATTEMPTS_WITH_FLASH = 2  # after this many failures, gate off encoder flash

DEADLINE_S = float(os.environ.get("LSS_BENCH_DEADLINE", "480"))
_T0 = time.monotonic()

PROBE_TIMEOUT_S = 90  # first backend init + tiny compile can take ~40 s
PROBE_BUDGET_S = min(240.0, DEADLINE_S * 0.5)  # never spend the whole wall probing


def _remaining() -> float:
    return DEADLINE_S - (time.monotonic() - _T0)


def _emit(payload: dict) -> None:
    payload.setdefault("metric", "audio_prompt_utterances_per_s_per_chip")
    payload.setdefault("unit", "utt/s")
    print(json.dumps(payload))


def _probe_backend() -> tuple[bool, str]:
    """Cheap subprocess probe: can the device backend initialize at all?

    Runs a trivial program (one 8x8 add + host transfer) in a CHILD process
    so a hung init is killed by the subprocess timeout instead of hanging
    bench.py. No engine, no model compile — a probe costs seconds when the
    backend is up and bounds cleanly when it is not. Retries with short
    sleeps inside PROBE_BUDGET_S.
    """
    code = (
        "import jax, numpy as np;"
        "x = jax.numpy.ones((8, 8));"
        "np.asarray(x + 1.0);"
        "print('PROBE_OK')"
    )
    last_err = "no probe attempted"
    probe_t0 = time.monotonic()
    attempt = 0
    while True:
        attempt += 1
        budget_left = PROBE_BUDGET_S - (time.monotonic() - probe_t0)
        if budget_left <= 5 or _remaining() <= 30:
            return False, last_err
        probe_timeout = min(PROBE_TIMEOUT_S, budget_left)
        try:
            r = subprocess.run(
                [sys.executable, "-c", code],
                capture_output=True,
                text=True,
                timeout=probe_timeout,
            )
            if r.returncode == 0 and "PROBE_OK" in r.stdout:
                return True, ""
            tail = (r.stderr or r.stdout).strip().splitlines()
            last_err = tail[-1] if tail else f"probe rc={r.returncode}"
        except subprocess.TimeoutExpired:
            last_err = f"probe timed out after {probe_timeout:.0f}s (backend init hung)"
        print(f"[bench] backend probe {attempt} failed: {last_err}", file=sys.stderr)
        time.sleep(min(5.0, max(0.0, budget_left - 1)))


class _AttemptTimeout(Exception):
    pass


def _alarm_handler(signum, frame):  # noqa: ARG001
    raise _AttemptTimeout("attempt exceeded the wall deadline (SIGALRM)")


def _run_attempt(audios):
    """Build a fresh engine and time ONE pipelined stream of ROUNDS batches.

    The stream runs through the bulk API
    (``generate_audio_response_batches``): batch i+1's host upload +
    encoder forward overlaps batch i's prefill+decode — the steady-state
    bulk-summarization regime (token streams identical to per-batch calls,
    tests/test_generate.py). The stream is all-or-nothing: a mid-stream
    worker fault discards the attempt and the NEXT attempt re-times the
    full stream on a rebuilt engine (a crash invalidates all device state,
    so the engine is never reused).

    Runs under a SIGALRM watchdog sized to the remaining wall budget, so a
    hung device call becomes a caught _AttemptTimeout, not an rc=124.

    Returns (seconds_per_round | None, error | None).
    """
    from llm_speech_summarization_tpu.configs import load_config
    from llm_speech_summarization_tpu.infer.engine import LLMSpeechTextInference

    budget = int(_remaining()) - 5
    if budget <= 30:
        return None, _AttemptTimeout("no wall budget left for an attempt")
    old = signal.signal(signal.SIGALRM, _alarm_handler)
    signal.alarm(budget)
    try:
        cfg = load_config("llm_speech_summarization_tpu/configs/yaml/llama3_hubert.yaml")
        engine = LLMSpeechTextInference(cfg)
        # warmup (compile)
        engine.generate_audio_response_batch(audios, max_new_tokens=MAX_NEW_TOKENS)
        t0 = time.perf_counter()
        outs = engine.generate_audio_response_batches(
            [audios] * ROUNDS, max_new_tokens=MAX_NEW_TOKENS
        )
        wall = time.perf_counter() - t0
        assert len(outs) == ROUNDS
        return wall / ROUNDS, None
    except Exception as e:  # noqa: BLE001 — worker faults surface as many types
        traceback.print_exc(file=sys.stderr)
        return None, e
    finally:
        signal.alarm(0)
        signal.signal(signal.SIGALRM, old)


def main():
    ok, probe_err = _probe_backend()
    if not ok:
        print("[bench] backend never initialized; emitting error line", file=sys.stderr)
        _emit(
            {
                "error": "backend unavailable",
                "detail": probe_err[:500],
                "probe_budget_s": PROBE_BUDGET_S,
                "deadline_s": DEADLINE_S,
            }
        )
        sys.exit(0)  # structured artifact > bare nonzero: the JSON says "error"

    rng = np.random.RandomState(0)
    sr = 16000
    audios = [
        (0.1 * rng.randn(int(AUDIO_SECONDS * sr))).astype(np.float32) for _ in range(BATCH)
    ]

    sec_per_round = None
    last_err = None
    encoder_flash = os.environ.get("LSS_ENCODER_FLASH", "1") != "0"
    for attempt in range(1, MAX_ATTEMPTS + 1):
        if _remaining() <= 60:
            print("[bench] wall deadline reached, stopping attempts", file=sys.stderr)
            break
        if attempt > ATTEMPTS_WITH_FLASH and encoder_flash:
            print(
                f"[bench] attempt {attempt}: gating off Pallas encoder attention "
                "(LSS_ENCODER_FLASH=0) to isolate suspected kernel fault",
                file=sys.stderr,
            )
            os.environ["LSS_ENCODER_FLASH"] = "0"
            encoder_flash = False
        sec_per_round, err = _run_attempt(audios)
        if err is None:
            break
        last_err = err
        print(
            f"[bench] attempt {attempt} failed: {err!r}; retrying in {5 * attempt}s",
            file=sys.stderr,
        )
        time.sleep(min(5 * attempt, max(0.0, _remaining() - 60)))

    if sec_per_round is None:
        print("[bench] all attempts failed, no timed stream completed", file=sys.stderr)
        _emit(
            {
                "error": "no timed stream completed",
                "detail": repr(last_err)[:500],
                "deadline_s": DEADLINE_S,
            }
        )
        sys.exit(0)

    utt_per_s = BATCH / sec_per_round
    _emit(
        {
            "value": round(utt_per_s, 3),
            "vs_baseline": round(utt_per_s / BASELINE_UTT_PER_S, 2),
            "rounds": ROUNDS,
            "encoder_flash": encoder_flash,
            "wall_s": round(time.monotonic() - _T0, 1),
        }
    )


if __name__ == "__main__":
    main()
