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

# Subtrees whose leaves are stacked along a leading layer axis (lax.scan
# towers): their torch-equivalent ndim is leaf.ndim - 1.
_STACKED_SUBTREES = {"blocks", "cross"}


def decay_mask(params: Dict[str, Any]):
    """Reference decay rule (main.py:342): decay iff torch-ndim >= 2 and the
    name contains none of bn/ln/bias/logit_scale. Our towers stack per-layer
    params ([L, ...]), so the torch-equivalent ndim subtracts the layer axis
    for leaves under a stacked subtree. Covers every family: ViT/text
    (in_proj_w..., token_embedding, pos_embed decay; ln/bias/ls_gamma/
    class_embedding don't), ResNet (conv*_w/down_conv_w/attnpool q_w..c_w
    decay; bn stats+affine don't), CoCa (cross blocks decay; cls_emb
    doesn't), AttentionalPooler (query/q_proj_w.. decay)."""

    def mask_leaf(path, leaf):
        keys = [p.key if hasattr(p, "key") else str(p) for p in path]
        name = keys[-1]
        if (
            "bn" in name
            or "ln" in name
            or "bias" in name
            or name.endswith("_b")
            or "logit_scale" in name
        ):
            return False
        stacked = any(k in _STACKED_SUBTREES for k in keys[:-1])
        torch_ndim = jnp.ndim(leaf) - (1 if stacked else 0)
        return torch_ndim >= 2

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


def trainable_mask(
    params: Dict[str, Any],
    *,
    lock_image: bool = False,
    lock_text: bool = False,
) -> Dict[str, Any]:
    """True = parameter receives optimizer updates.

    Always freezes BatchNorm running stats (torch keeps them as buffers
    outside the optimizer; they live in our param tree for checkpoint
    round-trips). ``lock_image`` / ``lock_text`` freeze whole towers — the
    reference's LiT-style ``--lock-image`` / ``--lock-text``
    (``src/training/main.py:294-305``, ``src/open_clip/transformer.py:
    435-466``); per-group partial unlocking is handled separately by
    :func:`unlock_groups_vector` because block params are stacked here.
    """

    def mask_leaf(path, _leaf):
        keys = [p.key if hasattr(p, "key") else str(p) for p in path]
        name = keys[-1]
        if name.endswith("_mean") or name.endswith("_var"):
            return False  # BN running stats are buffers, never optimized
        if lock_image and keys and keys[0] == "visual":
            return False
        if lock_text and keys and keys[0] in ("text", "token_embedding"):
            return False
        return True

    return jax.tree_util.tree_map_with_path(mask_leaf, params)


def unlock_groups_vector(num_layers: int, unlocked_groups: int) -> jnp.ndarray:
    """[L] 0/1 keep-vector: the last ``unlocked_groups`` blocks train, the
    rest freeze — reference ``transformer.py:435-466`` group semantics for
    stacked block params."""
    keep = jnp.arange(num_layers) >= (num_layers - unlocked_groups)
    return keep.astype(jnp.float32)


# Reference lock-group ordering (transformer.py:435-466): the parameter
# groups of a tower are
#   [embeddings/pre, block_0 .. block_{L-2}, [block_{L-1}, ln_post], proj]
# and ``unlocked_groups=n`` unlocks the LAST n groups — so n=1 unlocks ONLY
# the projection; ln_post travels with the last block (n>=2). Key sets per
# tower (leaves not matched are conservatively kept trainable):
_TOWER_HEAD_KEYS = {
    "visual": {"patch_kernel", "patch_bias", "class_embedding", "pos_embed",
               "ln_pre_scale", "ln_pre_bias"},
    "text": {"token_embedding", "pos_embed"},
}
# unlocked at n >= 1 (the reference's final group)
_TOWER_PROJ_KEYS = {
    "visual": {"proj"},
    "text": {"text_projection", "text_projection_b"},
}
# grouped with the LAST block: unlocked at n >= 2
_TOWER_POST_KEYS = {
    "visual": {"ln_post_scale", "ln_post_bias", "attn_pool", "map_head"},
    "text": {"ln_final_scale", "ln_final_bias", "cls_emb"},
}


def mask_tower_updates(tower: str, unlocked_groups: int):
    """GradientTransformation zeroing one tower's updates per the reference
    group semantics: ``unlocked_groups=1`` keeps only the post/proj group,
    ``=2`` also the last block, etc. Applied AFTER AdamW so frozen slices
    get neither the gradient step nor weight decay; their moments accumulate
    zeros harmlessly. Works on stacked [L, ...] block params via a 0/1
    layer-keep vector."""

    def init_fn(params):
        del params
        return optax.EmptyState()

    def update_fn(updates, state, params=None):
        del params
        tree = dict(updates[tower])
        if "blocks" not in tree:
            # ResNet/stage-structured towers have no uniform block stack;
            # the reference similarly only supports ViT partial unlocking
            raise ValueError(
                f"partial unlocking (unlocked_groups={unlocked_groups}) is "
                f"only supported for transformer towers; the {tower!r} tower "
                "has no 'blocks' stack (use full locking instead)"
            )
        blocks = dict(tree["blocks"])
        num_layers = jax.tree_util.tree_leaves(blocks)[0].shape[0]
        keep_vec = unlock_groups_vector(num_layers, max(unlocked_groups - 1, 0))
        for k, v in blocks.items():
            keep = keep_vec.reshape((-1,) + (1,) * (jnp.ndim(v) - 1))
            blocks[k] = v * keep.astype(v.dtype)
        tree["blocks"] = blocks
        head = _TOWER_HEAD_KEYS.get(tower, set())
        proj = _TOWER_PROJ_KEYS.get(tower, set())
        post = _TOWER_POST_KEYS.get(tower, set())
        head_unlocked = unlocked_groups >= num_layers + 2
        for k, v in tree.items():
            if k == "blocks":
                continue
            frozen = (
                (k in head and not head_unlocked)
                or (k in proj and unlocked_groups < 1)
                or (k in post and unlocked_groups < 2)
            )
            if frozen:
                tree[k] = jax.tree_util.tree_map(jnp.zeros_like, v)
        new = dict(updates)
        new[tower] = tree
        return new, state

    return optax.GradientTransformation(init_fn, update_fn)


def make_optimizer(
    schedule,
    *,
    beta1: float = 0.9,
    beta2: float = 0.98,
    eps: float = 1e-6,
    weight_decay: float = 0.2,
    grad_clip_norm: Optional[float] = None,
    accum_steps: int = 1,
    lock_image: bool = False,
    lock_text: bool = False,
    lock_image_unlocked_groups: int = 0,
    lock_text_unlocked_groups: int = 0,
) -> optax.GradientTransformation:
    """AdamW with reference decay groups; optional grad clipping, gradient
    accumulation, and LiT-style tower locking.

    ``accum_steps > 1`` wraps the optimizer in ``optax.MultiSteps``: the
    parameter update applies every k train-step calls with averaged grads.
    Note the semantics difference vs a true k×-larger batch: InfoNCE
    negatives stay within each microbatch (the reference's --accum-freq
    feature-caching scheme is unimplemented in its LatteCLIP path too —
    reference train.py:397,531-532 raises NotImplemented).

    Locking: a fully locked tower (unlocked_groups == 0) is excluded via
    ``optax.masked`` over :func:`trainable_mask` (no update, no decay);
    with ``unlocked_groups > 0`` the last n blocks stay trainable and the
    stack update is sliced per-layer by :func:`mask_tower_updates`.
    """
    full_image_lock = lock_image and lock_image_unlocked_groups == 0
    full_text_lock = lock_text and lock_text_unlocked_groups == 0

    def not_trainable(params):
        mask = trainable_mask(
            params, lock_image=full_image_lock, lock_text=full_text_lock
        )
        return jax.tree_util.tree_map(lambda t: not t, mask)

    adamw = optax.adamw(
        learning_rate=schedule,
        b1=beta1,
        b2=beta2,
        eps=eps,
        weight_decay=weight_decay,
        mask=decay_mask,
    )
    parts = [adamw]
    # zero out updates for frozen leaves (BN stats + fully locked towers)
    parts.append(optax.masked(optax.set_to_zero(), not_trainable))
    if lock_image and lock_image_unlocked_groups > 0:
        parts.append(mask_tower_updates("visual", lock_image_unlocked_groups))
    if lock_text and lock_text_unlocked_groups > 0:
        parts.append(mask_tower_updates("text", lock_text_unlocked_groups))
    tx = optax.chain(*parts) if len(parts) > 1 else adamw
    if grad_clip_norm is not None:
        tx = optax.chain(optax.clip_by_global_norm(grad_clip_norm), tx)
    if accum_steps > 1:
        tx = optax.MultiSteps(tx, every_k_schedule=accum_steps)
    return tx
