"""LR schedules (reference: src/optimization/sched.py:8-47 + the live
loop's MultiStepLR usage at tasks/run_video_qa.py:419-422,524-525)."""

from __future__ import annotations

from typing import Optional, Sequence

import optax


def noam(learning_rate: float, warmup_steps: int) -> optax.Schedule:
    """invsqrt/noam (sched.py:8-17):
    lr * min(step^-0.5, step * warmup^-1.5) * warmup^0.5 — peaks at lr
    after warmup then decays as 1/sqrt(step)."""
    def sched(step):
        import jax.numpy as jnp
        step = jnp.maximum(step, 1).astype(jnp.float32)
        return learning_rate * jnp.minimum(
            step ** -0.5, step * warmup_steps ** -1.5) * warmup_steps ** 0.5

    return sched


def warmup_linear(learning_rate: float, warmup_steps: int,
                  total_steps: int, floor: float = 1e-8) -> optax.Schedule:
    """linear warmup then linear decay to ~0 (sched.py:20-35)."""
    def sched(step):
        import jax.numpy as jnp
        step = step.astype(jnp.float32) if hasattr(step, "astype") \
            else float(step)
        warm = learning_rate * step / max(warmup_steps, 1)
        decay = learning_rate * jnp.maximum(
            (total_steps - step) / max(total_steps - warmup_steps, 1), floor)
        return jnp.where(step < warmup_steps, warm, decay)

    return sched


def multi_step(learning_rate: float, milestones: Sequence[int],
               gamma: float = 0.5) -> optax.Schedule:
    """MultiStepLR: lr * gamma^(number of passed milestones).

    ``milestones`` are in *scheduler steps*; the caller converts epochs
    to steps (sasvqa_tpu/train/steps.make_optimizer).  Reference quirk
    NOT preserved: the live loop steps its scheduler once per validation
    block (run_video_qa.py:524-525); here milestones are global-step
    based, a documented deliberate divergence.
    """
    def sched(step):
        import jax.numpy as jnp
        count = sum((step >= m).astype(jnp.float32) if hasattr(step, "astype")
                    else float(step >= m) for m in milestones)
        return learning_rate * gamma ** count

    return sched


def constant(learning_rate: float) -> optax.Schedule:
    return optax.constant_schedule(learning_rate)


def lr_value(decay: str, learning_rate: float, step: int,
             total_steps: int = 0, warmup_ratio: float = 0.1,
             milestones: Optional[Sequence[int]] = None,
             gamma: float = 0.5, floor: float = 1e-8) -> float:
    """Host-side (pure Python) lr at an optimizer step.

    Mirrors :func:`get_lr_schedule` exactly (pinned by
    tests/test_optimizer.py::test_lr_value_matches_schedules) so the
    training loop can log ``train/lr`` (the reference's metrics
    taxonomy, run_video_retrieval.py:468-482) without any device op or
    fetch in the hot loop."""
    step = int(step)
    if decay == "constant" or decay is None:
        return float(learning_rate)
    if decay == "multi_step":
        count = sum(step >= m for m in (milestones or []))
        return float(learning_rate * gamma ** count)
    warmup = max(int(warmup_ratio * total_steps), 1)
    if decay == "linear":
        if step < warmup:
            return float(learning_rate * step / warmup)
        return float(learning_rate * max(
            (total_steps - step) / max(total_steps - warmup, 1), floor))
    if decay == "invsqrt":
        s = float(max(step, 1))
        return float(learning_rate
                     * min(s ** -0.5, s * warmup ** -1.5) * warmup ** 0.5)
    raise ValueError(f"unknown decay {decay!r}")


def get_lr_schedule(decay: str, learning_rate: float,
                    total_steps: int = 0, warmup_ratio: float = 0.1,
                    milestones: Optional[Sequence[int]] = None,
                    gamma: float = 0.5) -> optax.Schedule:
    """Dispatch matching sched.py:28-47 names + the live 'constant'/
    'multi_step' paths."""
    if decay == "constant" or decay is None:
        return constant(learning_rate)
    if decay == "multi_step":
        return multi_step(learning_rate, milestones or [], gamma)
    warmup = max(int(warmup_ratio * total_steps), 1)
    if decay == "linear":
        return warmup_linear(learning_rate, warmup, total_steps)
    if decay == "invsqrt":
        return noam(learning_rate, warmup)
    raise ValueError(f"unknown decay {decay!r}")
