"""LR schedules (parity: reference train/lr_common_manager.py).

Implemented as optax-compatible schedule fns (step -> lr).
"""
from __future__ import annotations

from typing import Any, Dict


def exp_decay_lr(cfg: Dict[str, Any]):
    """lr_init * rate^(step // decay_step), floored at lr_min
    (reference ExpDecayLR :19-30)."""
    lr_init = cfg.get("lr_init", 1e-4)
    decay_step = cfg.get("decay_step", 100000)
    decay_rate = cfg.get("decay_rate", 0.5)
    lr_min = cfg.get("lr_min", 1e-5)

    def schedule(step):
        lr = lr_init * decay_rate ** (step // decay_step)
        return max(lr, lr_min) if isinstance(step, int) else _clip(lr, lr_min)

    def _clip(lr, lo):
        import jax.numpy as jnp
        return jnp.maximum(lr, lo)

    return schedule


def warmup_exp_decay_lr(cfg: Dict[str, Any]):
    """Linear warmup then exp decay (reference WarmUpExpDecayLR :36-51)."""
    lr_warm = cfg.get("lr_warm", 1e-4)
    warm_step = cfg.get("warm_step", 5000)
    base = exp_decay_lr(cfg)

    def schedule(step):
        import jax.numpy as jnp
        warm = lr_warm * step / max(warm_step, 1)
        decay = base(step - warm_step)
        if isinstance(step, int):
            return warm if step < warm_step else decay
        return jnp.where(step < warm_step, warm, decay)

    return schedule


name2lr_manager = {
    "exp_decay": exp_decay_lr,
    "warm_up_exp_decay": warmup_exp_decay_lr,
}
