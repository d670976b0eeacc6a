"""Train state + optimizer.

The reference uses AdamW over encoder AND (pointlessly) frozen-LLM param
groups with a PolynomialLR power-1.0 (= linear) decay stepped every
grad-accum interval (reference: trainer.py:98-110). Here:

  * the optimizer covers ONLY the trainable audio-encoder params — the
    reference's frozen-LLM param group is a documented no-op, dropped;
  * linear decay is ``optax.linear_schedule`` over the same effective
    optimizer-step count, with optional warmup / grad clipping;
  * gradient accumulation is normally absorbed into real batching on the
    mesh (SURVEY.md §7 step 4), but ``optax.MultiSteps`` covers configs that
    still request it.
"""

from __future__ import annotations

from typing import Any, NamedTuple

import jax
import optax

from ..configs import Config


class TrainState(NamedTuple):
    step: Any  # scalar int
    enc_params: Any  # trainable audio-encoder params
    opt_state: Any


def make_schedule(cfg: Config, total_opt_steps: int) -> optax.Schedule:
    """The LR schedule — single source of truth for both the optimizer and
    the logged learning rate (round 1 logged pure linear decay even under
    warmup-cosine, so the TensorBoard curve lied for warmup configs)."""
    opt_cfg = cfg.train.optimizer
    if opt_cfg.warmup_steps > 0:
        return optax.warmup_cosine_decay_schedule(
            init_value=0.0,
            peak_value=opt_cfg.lr,
            warmup_steps=opt_cfg.warmup_steps,
            decay_steps=max(total_opt_steps, opt_cfg.warmup_steps + 1),
            end_value=0.0,
        )
    # reference PolynomialLR(power=1.0): lr(t) = lr0 * (1 - t/total)
    return optax.linear_schedule(
        init_value=opt_cfg.lr, end_value=0.0, transition_steps=max(total_opt_steps, 1)
    )


def make_optimizer(cfg: Config, total_opt_steps: int) -> optax.GradientTransformation:
    opt_cfg = cfg.train.optimizer
    schedule = make_schedule(cfg, total_opt_steps)
    tx_parts = []
    if opt_cfg.grad_clip_norm is not None:
        tx_parts.append(optax.clip_by_global_norm(opt_cfg.grad_clip_norm))
    tx_parts.append(
        optax.adamw(
            learning_rate=schedule,
            b1=opt_cfg.beta1,
            b2=opt_cfg.beta2,
            weight_decay=opt_cfg.weight_decay,
        )
    )
    tx = optax.chain(*tx_parts)
    if cfg.train.grad_accum_interval > 1:
        tx = optax.MultiSteps(tx, every_k_schedule=cfg.train.grad_accum_interval)
    return tx


def make_train_state(cfg: Config, enc_params, total_opt_steps: int) -> tuple[TrainState, optax.GradientTransformation]:
    tx = make_optimizer(cfg, total_opt_steps)
    opt_state = tx.init(enc_params)
    return TrainState(step=jax.numpy.zeros((), jax.numpy.int32), enc_params=enc_params, opt_state=opt_state), tx


def lr_at(cfg: Config, total_opt_steps: int, step: int) -> float:
    """Current learning rate (for logging parity, reference: trainer.py:391).

    Closed-form HOST math replicating make_schedule exactly (pinned by
    tests/test_trainer_burrs.py against the optax schedule): evaluating
    the optax schedule here ran a handful of eager jnp ops + a host
    transfer on the pinned remote backend EVERY log interval (~0.5-2 s a
    call billed into step_time_s — CLAUDE.md's no-eager-device-code rule).
    """
    import math

    opt_cfg = cfg.train.optimizer
    t = min(step, total_opt_steps)
    if opt_cfg.warmup_steps > 0:
        warm = opt_cfg.warmup_steps
        decay = max(total_opt_steps, warm + 1)
        if t < warm:
            return opt_cfg.lr * t / warm
        # optax.warmup_cosine_decay: cosine from peak to 0 over
        # [warmup_steps, decay_steps], clamped past the end
        frac = min(max((t - warm) / max(decay - warm, 1), 0.0), 1.0)
        return opt_cfg.lr * 0.5 * (1.0 + math.cos(math.pi * frac))
    total = max(total_opt_steps, 1)
    return opt_cfg.lr * max(1.0 - t / total, 0.0)
