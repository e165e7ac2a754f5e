"""Optimizer + LR schedules.

AdamW with the reference's two-group weight decay (decay everything except
LayerNorm/bias/1-D params/logit_scale — reference
``src/training/main.py:342-357``) and its ViT-family defaults
β=(0.9, 0.98), eps=1e-6, wd=0.2 (reference ``src/training/params.py:5-11``).
Because block parameters are stacked here (a LayerNorm scale is ``[L, D]``),
the mask is name-based rather than ndim-based; the per-tensor decay set
matches the reference's exactly.

Schedules replicate ``src/training/scheduler.py``: linear warmup
``base_lr * (step+1)/warmup`` then cosine / const / const-with-cooldown.
"""
from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import optax

# leaf names that receive weight decay (torch ndim>=2 equivalents)
_DECAY_KEYS = {
    "in_proj_w", "out_proj_w", "c_fc_w", "c_proj_w",
    "patch_kernel", "proj", "text_projection", "token_embedding", "pos_embed",
}
# explicitly excluded: ln_* scales/biases, *_b biases, class_embedding, logit_scale


def decay_mask(params: Dict[str, Any]):
    flat = jax.tree_util.tree_flatten_with_path(params)[0]

    def mask_leaf(path, _leaf):
        leaf_name = path[-1].key if hasattr(path[-1], "key") else str(path[-1])
        return leaf_name in _DECAY_KEYS

    return jax.tree_util.tree_map_with_path(mask_leaf, params)


def warmup_cosine(base_lr: float, warmup: int, total_steps: int):
    """cosine_lr semantics (scheduler.py:43-53)."""

    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        warm = base_lr * (step + 1.0) / max(warmup, 1)
        e = step - warmup
        es = max(total_steps - warmup, 1)
        cos = 0.5 * (1.0 + jnp.cos(jnp.pi * e / es)) * base_lr
        return jnp.where(step < warmup, warm, cos)

    return schedule


def warmup_const(base_lr: float, warmup: int):
    """const_lr semantics (scheduler.py:13-21)."""

    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        warm = base_lr * (step + 1.0) / max(warmup, 1)
        return jnp.where(step < warmup, warm, base_lr)

    return schedule


def warmup_const_cooldown(
    base_lr: float,
    warmup: int,
    total_steps: int,
    cooldown_steps: int,
    cooldown_power: float = 1.0,
    cooldown_end_lr: float = 0.0,
):
    """const_lr_cooldown semantics (scheduler.py:24-40)."""

    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        warm = base_lr * (step + 1.0) / max(warmup, 1)
        start = total_steps - cooldown_steps
        e = step - start
        es = max(cooldown_steps, 1)
        decay = (1.0 - e / es) ** cooldown_power
        cooled = decay * (base_lr - cooldown_end_lr) + cooldown_end_lr
        lr = jnp.where(step < start, base_lr, cooled)
        return jnp.where(step < warmup, warm, lr)

    return schedule


def make_schedule(
    kind: str,
    base_lr: float,
    warmup: int,
    total_steps: int = 0,
    cooldown_steps: int = 0,
    cooldown_power: float = 1.0,
    cooldown_end_lr: float = 0.0,
):
    if kind == "cosine":
        return warmup_cosine(base_lr, warmup, total_steps)
    if kind == "const":
        return warmup_const(base_lr, warmup)
    if kind == "const-cooldown":
        return warmup_const_cooldown(
            base_lr, warmup, total_steps, cooldown_steps, cooldown_power, cooldown_end_lr
        )
    raise ValueError(f"unknown lr scheduler: {kind}")


def make_optimizer(
    schedule,
    *,
    beta1: float = 0.9,
    beta2: float = 0.98,
    eps: float = 1e-6,
    weight_decay: float = 0.2,
    grad_clip_norm: Optional[float] = None,
    accum_steps: int = 1,
) -> optax.GradientTransformation:
    """AdamW with reference decay groups; optional grad clipping and
    gradient accumulation.

    ``accum_steps > 1`` wraps the optimizer in ``optax.MultiSteps``: the
    parameter update applies every k train-step calls with averaged grads.
    Note the semantics difference vs a true k×-larger batch: InfoNCE
    negatives stay within each microbatch (the reference's --accum-freq
    feature-caching scheme is unimplemented in its LatteCLIP path too —
    reference train.py:397,531-532 raises NotImplemented).
    """
    adamw = optax.adamw(
        learning_rate=schedule,
        b1=beta1,
        b2=beta2,
        eps=eps,
        weight_decay=weight_decay,
        mask=decay_mask,
    )
    tx = adamw
    if grad_clip_norm is not None:
        tx = optax.chain(optax.clip_by_global_norm(grad_clip_norm), tx)
    if accum_steps > 1:
        tx = optax.MultiSteps(tx, every_k_schedule=accum_steps)
    return tx
