"""Learning-rate schedules as optax schedules.

Capability parity: reference ``notorch/schedulers.py:18-86`` — the
chemprop-lineage "Noam-like" schedule: linear warmup ``init_lr -> max_lr``
over ``warmup_steps``, exponential decay ``max_lr -> final_lr`` over
``cooldown_steps``, then constant ``final_lr``.
"""

from __future__ import annotations

import jax.numpy as jnp


def noam_like_schedule(
    warmup_steps: int,
    cooldown_steps: int,
    init_lr: float,
    max_lr: float,
    final_lr: float,
):
    warmup_steps = max(int(warmup_steps), 1)
    cooldown_steps = max(int(cooldown_steps), 1)

    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        warm = init_lr + (max_lr - init_lr) * step / warmup_steps
        gamma = (final_lr / max_lr) ** (1.0 / cooldown_steps)
        cool = max_lr * gamma ** (step - warmup_steps)
        lr = jnp.where(
            step < warmup_steps,
            warm,
            jnp.where(step < warmup_steps + cooldown_steps, cool, final_lr),
        )
        return lr

    return schedule
