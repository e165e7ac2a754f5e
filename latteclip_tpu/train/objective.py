"""Contrastive objectives (InfoNCE / CLIP loss) + confidence weighting.

``clip_loss`` reproduces the reference ``ClipLoss`` math
(``src/open_clip/loss.py:89-130``): symmetric cross-entropy over
``scale * img @ text.T`` with diagonal (arange) targets. Under a device
mesh the features arrive sharded on the ``data`` axis and the full logit
matrix is formed by GSPMD — XLA inserts the all-gather the reference does by
hand with ``torch.distributed.nn.all_gather`` (``loss.py:19-63``); the math
equals the reference's ``local_loss + gather_with_grad`` configuration.

``text_confidence_weights`` reproduces ``compute_text_weights``
(``src/training/train.py:292-303``): the top1−top2 margin of
``text_feat @ prototypes.T`` (the ``preds`` argument of the reference is
unused there beyond a dead mask, and is omitted).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def cross_entropy_with_int_labels(logits: jnp.ndarray, labels: jnp.ndarray) -> jnp.ndarray:
    """Mean CE, f32 log-softmax (matches torch F.cross_entropy)."""
    logits = logits.astype(jnp.float32)
    logz = jax.nn.logsumexp(logits, axis=-1)
    picked = jnp.take_along_axis(logits, labels[:, None], axis=-1)[:, 0]
    return jnp.mean(logz - picked)


def clip_loss(
    image_features: jnp.ndarray,
    text_features: jnp.ndarray,
    logit_scale: jnp.ndarray,
) -> jnp.ndarray:
    """Symmetric InfoNCE over the (global) batch."""
    logits_per_image = logit_scale * image_features @ text_features.T
    labels = jnp.arange(logits_per_image.shape[0])
    return 0.5 * (
        cross_entropy_with_int_labels(logits_per_image, labels)
        + cross_entropy_with_int_labels(logits_per_image.T, labels)
    )


def distill_clip_loss(
    image_features: jnp.ndarray,
    text_features: jnp.ndarray,
    logit_scale: jnp.ndarray,
    teacher_image_features: jnp.ndarray,
    teacher_text_features: jnp.ndarray,
    teacher_logit_scale: jnp.ndarray,
) -> jnp.ndarray:
    """Soft-target distillation (reference DistillClipLoss, loss.py:324-362):
    CE of the student's logit distributions against the frozen teacher's, in
    both directions."""

    def dist_loss(teacher_logits, student_logits):
        t = jax.nn.softmax(teacher_logits.astype(jnp.float32), axis=1)
        s = jax.nn.log_softmax(student_logits.astype(jnp.float32), axis=1)
        return -jnp.mean(jnp.sum(t * s, axis=1))

    student_i2t = logit_scale * image_features @ text_features.T
    teacher_i2t = teacher_logit_scale * teacher_image_features @ teacher_text_features.T
    return 0.5 * (
        dist_loss(teacher_i2t, student_i2t) + dist_loss(teacher_i2t.T, student_i2t.T)
    )


def _sigmoid_pair_loss(
    image_features, text_features, logit_scale, logit_bias, negative_only=False
) -> jnp.ndarray:
    logits = logit_scale * image_features @ text_features.T + logit_bias
    n = logits.shape[0]
    targets = -jnp.ones((n, text_features.shape[0]), jnp.float32)
    if not negative_only:
        targets = targets + 2.0 * jnp.eye(n, text_features.shape[0], dtype=jnp.float32)
    return -jnp.sum(jax.nn.log_sigmoid(targets * logits)) / n


def siglip_ring_loss(
    image_features: jnp.ndarray,
    text_features: jnp.ndarray,
    logit_scale: jnp.ndarray,
    logit_bias: jnp.ndarray,
    axis_name: str,
) -> jnp.ndarray:
    """SigLIP loss with ring text-feature exchange over a mesh axis.

    The ICI-native equivalent of the reference's bidirectional P2P ring
    (``loss.py:365-450,505-560``): each shard scores its local image block
    against every text block, received via ``lax.ppermute`` rotations —
    bandwidth O(B/n) per step instead of an all-gather. Must run inside
    ``shard_map`` over ``axis_name``; gradients flow through ppermute's
    transpose automatically (vs the reference's hand-written
    autograd.Function).
    """
    n = jax.lax.psum(1, axis_name)
    loss = _sigmoid_pair_loss(image_features, text_features, logit_scale, logit_bias)

    def body(i, carry):
        loss, text_rot = carry
        src_dst = [(j, (j + 1) % n) for j in range(n)]
        text_rot = jax.lax.ppermute(text_rot, axis_name, src_dst)
        loss = loss + _sigmoid_pair_loss(
            image_features, text_rot, logit_scale, logit_bias, negative_only=True
        )
        return loss, text_rot

    loss, _ = jax.lax.fori_loop(0, n - 1, body, (loss, text_features))
    # each shard's loss is already per-local-row; averaging over shards gives
    # sum(all pairs) / global_batch — identical to the full-matrix form
    return jax.lax.pmean(loss, axis_name)


def siglip_full_loss(
    image_features: jnp.ndarray,
    text_features: jnp.ndarray,
    logit_scale: jnp.ndarray,
    logit_bias: jnp.ndarray,
) -> jnp.ndarray:
    """Reference-semantics SigLIP loss over the full (global) batch:
    sum of pairwise -log sigmoid over all pairs / batch (loss.py:454-470)."""
    return _sigmoid_pair_loss(image_features, text_features, logit_scale, logit_bias)


def text_confidence_weights(
    text_features: jnp.ndarray,
    prototypes: jnp.ndarray,
) -> jnp.ndarray:
    """Top1−top2 margin of text·prototypeᵀ, detached (train.py:292-303)."""
    sims = text_features @ prototypes.T  # [B, C]
    top2 = jax.lax.top_k(sims, 2)[0]
    return jax.lax.stop_gradient(top2[:, 0] - top2[:, 1])
