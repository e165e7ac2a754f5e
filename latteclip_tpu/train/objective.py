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

from typing import Dict, Optional

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


def siglip_loss(
    image_features: jnp.ndarray,
    text_features: jnp.ndarray,
    logit_scale: jnp.ndarray,
    logit_bias: jnp.ndarray,
) -> jnp.ndarray:
    """Pairwise sigmoid loss (reference SigLipLoss semantics,
    loss.py:365-560, full-matrix form). The reference's ring
    neighbour-exchange is a bandwidth optimisation for huge world sizes; on a
    TPU mesh the full matrix with GSPMD collectives is the natural form."""
    logits = logit_scale * image_features @ text_features.T + logit_bias
    n = logits.shape[0]
    targets = 2.0 * jnp.eye(n, dtype=jnp.float32) - 1.0  # +1 diagonal, -1 off
    return -jnp.mean(jnp.sum(jax.nn.log_sigmoid(targets * logits), axis=-1))


def text_confidence_weights(
    text_features: jnp.ndarray,
    prototypes: jnp.ndarray,
) -> jnp.ndarray:
    """Top1−top2 margin of text·prototypeᵀ, detached (train.py:292-303)."""
    sims = text_features @ prototypes.T  # [B, C]
    top2 = jax.lax.top_k(sims, 2)[0]
    return jax.lax.stop_gradient(top2[:, 0] - top2[:, 1])
