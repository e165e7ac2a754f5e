"""Image↔text retrieval metrics + validation contrastive loss.

``clip_retrieval_metrics`` reproduces the reference's ``get_clip_metrics``
(``src/training/train.py:1506-1523``): mean/median rank and R@1/5/10 in both
directions over the full feature matrix. ``validation_loss`` reproduces the
"val" branch of ``evaluate`` (``train.py:1399-1468``): per-batch symmetric
InfoNCE accumulated sample-weighted, plus retrieval metrics over all
accumulated features.
"""
from __future__ import annotations

from typing import Dict, Iterable, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from latteclip_tpu.core.config import CLIPConfig
from latteclip_tpu.data import transforms as T
from latteclip_tpu.models import clip as clip_mod
from latteclip_tpu.train.objective import clip_loss
from latteclip_tpu.core.mesh import tpu_jit


def clip_retrieval_metrics(
    image_features: np.ndarray,
    text_features: np.ndarray,
    logit_scale: float,
) -> Dict[str, float]:
    logits_i2t = logit_scale * image_features @ text_features.T
    out: Dict[str, float] = {}
    n = len(text_features)
    gt = np.arange(n)[:, None]
    for name, logits in (("image_to_text", logits_i2t), ("text_to_image", logits_i2t.T)):
        ranking = np.argsort(-logits, axis=1)
        preds = np.where(ranking == gt)[1]
        out[f"{name}_mean_rank"] = float(preds.mean() + 1)
        out[f"{name}_median_rank"] = float(np.floor(np.median(preds)) + 1)
        for k in (1, 5, 10):
            out[f"{name}_R@{k}"] = float(np.mean(preds < k))
    return out


def validation_loss(
    params,
    cfg: CLIPConfig,
    batches: Iterable[Tuple[np.ndarray, np.ndarray]],
) -> Dict[str, float]:
    """Iterate (uint8 images, token) batches; returns clip_val_loss + R@k."""

    @tpu_jit
    def encode(p, images_u8, tokens):
        images = T.normalize_images(images_u8, *T.model_mean_std(cfg))
        img = clip_mod.encode_image(p, cfg, images, normalize=True)
        txt = clip_mod.encode_text(p, cfg, tokens, normalize=True)
        scale = jnp.exp(p["logit_scale"])
        return img, txt, clip_loss(img, txt, scale), scale

    all_img, all_txt = [], []
    cumulative = 0.0
    n = 0
    scale = 1.0
    for images_u8, tokens in batches:
        img, txt, loss, scale = encode(params, jnp.asarray(images_u8), jnp.asarray(tokens))
        bs = images_u8.shape[0]
        cumulative += float(loss) * bs
        n += bs
        all_img.append(np.asarray(img))
        all_txt.append(np.asarray(txt))
    if n == 0:
        return {}
    metrics = clip_retrieval_metrics(
        np.concatenate(all_img), np.concatenate(all_txt), float(scale)
    )
    metrics["clip_val_loss"] = cumulative / n
    metrics["num_samples"] = n
    return metrics


def evaluate_val_pairs(
    params,
    cfg: CLIPConfig,
    dataset,
    batch_size: int = 64,
    tokenizer=None,
) -> Dict[str, float]:
    """Epoch val-set evaluation over an (image, caption) pairs dataset —
    the reference ``evaluate``'s val branch (``train.py:1399-1471``):
    contrastive val loss + image↔text R@1/5/10. ``dataset`` exposes
    ``__len__`` and ``load_sample(i) -> (uint8 image, caption str)``
    (e.g. :class:`latteclip_tpu.data.folder_dataset.CsvDataset`)."""
    if tokenizer is None:
        from latteclip_tpu.models.tokenizer import get_tokenizer

        tokenizer = get_tokenizer(cfg.text.context_length)

    def batches():
        for start in range(0, len(dataset), batch_size):
            idx = range(start, min(start + batch_size, len(dataset)))
            samples = [dataset.load_sample(i) for i in idx]
            imgs = np.stack([s[0] for s in samples])
            toks = tokenizer([s[1] for s in samples])
            yield imgs, toks

    return validation_loss(params, cfg, batches())
