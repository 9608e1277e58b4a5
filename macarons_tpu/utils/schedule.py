"""Learning-rate schedules matching the reference optimizer wrappers.

WarmupConstantOpt (reference utils.py:308-349): lr(step) = base * min(1, step/warmup),
with epoch-level multiplicative drops (`lr_epochs` / `lr_factor`,
pretrain_scone_occ.py run_training). Also the Noam schedule (utils.py:263-305).
"""

from __future__ import annotations

from typing import Sequence


def warmup_constant_schedule(base_lr: float, warmup: int,
                             lr_epochs: Sequence[int] = (),
                             lr_factor: float = 1.0,
                             steps_per_epoch: int = 1):
    """Returns lr(step). Epoch drops apply the factor once per listed epoch."""
    import jax.numpy as jnp

    boundaries = sorted(int(e) * steps_per_epoch for e in lr_epochs)

    def schedule(step):
        lr = base_lr * jnp.minimum(1.0, (step + 1) / max(warmup, 1))
        for b in boundaries:
            lr = jnp.where(step >= b, lr * lr_factor, lr)
        return lr

    return schedule


def noam_schedule(model_size: float, warmup: int, factor: float = 1.0):
    """Noam: factor * model_size^-0.5 * min(step^-0.5, step * warmup^-1.5)."""
    import jax.numpy as jnp

    def schedule(step):
        s = jnp.maximum(step, 1).astype(jnp.float32)
        return factor * model_size ** -0.5 * jnp.minimum(
            s ** -0.5, s * warmup ** -1.5
        )

    return schedule
