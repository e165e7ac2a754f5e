"""Fusion-weight analysis job (reference ``extract_group_weights``).

Reproduces ``src/training/train.py:639-808``: run the frozen model over the
train pipeline and dump, per sample, the *relative weight of the group
caption* in the fused text feature (``group_weight = w_group / (w_label +
w_image + w_group)``, ungated — ``train.py:780-783``) to
``group_weights.npy``, plus a ``all_labels.json`` with zero-shot/fine-tune/
ground-truth labels and the captions per image (``train.py:744-752``).
"""
from __future__ import annotations

import json
import logging
import os
from typing import Dict, List

import jax
import jax.numpy as jnp
import numpy as np

from latteclip_tpu.core.config import CLIPConfig
from latteclip_tpu.data import transforms as T
from latteclip_tpu.data.pipeline import LatteCLIPTrainData, PipelineConfig, TrainPipeline
from latteclip_tpu.models import clip as clip_mod
from latteclip_tpu.models.layers import l2_normalize
from latteclip_tpu.models.tokenizer import ClipTokenizer
from latteclip_tpu.train.objective import text_confidence_weights
from latteclip_tpu.train.state import build_template_table
from latteclip_tpu.core.mesh import tpu_jit

logger = logging.getLogger(__name__)

WEIGHT_EPS = 1e-6


def extract_group_weights(
    params,
    cfg: CLIPConfig,
    data: LatteCLIPTrainData,
    memory_bank: np.ndarray,
    templates,
    tokenizer: ClipTokenizer,
    out_dir: str,
    *,
    batch_size: int = 64,
    image_size: int = 224,
) -> np.ndarray:
    os.makedirs(out_dir, exist_ok=True)
    table = jnp.asarray(build_template_table(tokenizer, data.class_names, templates))
    prototypes = jnp.asarray(memory_bank, jnp.float32)
    classifier = l2_normalize(prototypes)

    @tpu_jit
    def weights_fn(p, images_u8, per_img_tok, per_grp_tok, zs_preds):
        images = T.normalize_images(images_u8, *T.model_mean_std(cfg))
        img = clip_mod.encode_image(p, cfg, images, normalize=True)
        logits = 100.0 * img @ classifier.T
        preds = jnp.argmax(logits, axis=1)
        class_feats = clip_mod.encode_text(p, cfg, table, normalize=True)
        label_f = class_feats[preds]
        cap = jnp.concatenate([per_img_tok, per_grp_tok], axis=0)
        cap_f = clip_mod.encode_text(p, cfg, cap, normalize=True)
        per_img_f, per_grp_f = jnp.split(cap_f, 2, axis=0)
        w_img = text_confidence_weights(per_img_f, prototypes) + WEIGHT_EPS
        w_grp = text_confidence_weights(per_grp_f, prototypes) + WEIGHT_EPS
        w_label = text_confidence_weights(label_f, prototypes) + WEIGHT_EPS
        total = w_label + w_img + w_grp
        return w_grp / total, preds

    pipe = TrainPipeline(
        data,
        PipelineConfig(batch_size=batch_size, image_size=image_size, shuffle_buffer=1),
        num_samples=len(data.zs_top1),
    )
    # Iterate the sample stream for EXACTLY num_samples unique samples: the
    # reference analysis covers the whole dataset once (train.py:639-808),
    # while pipe.epoch() yields only N//B full batches (tail dropped) and
    # wraps duplicates when N < B. The final short batch is padded to the
    # jit's static shape and trimmed after.
    stream = pipe._sample_stream(0)
    group_weights: List[np.ndarray] = []
    items: List[Dict] = []
    remaining = pipe.num_samples
    while remaining > 0:
        take = min(batch_size, remaining)
        samples = [next(stream) for _ in range(take)]
        valid = len(samples)
        while len(samples) < batch_size:
            samples.append(samples[0])
        batch = {
            "images": np.stack([s["image"] for s in samples]),
            "per_image_tokens": np.stack([s["per_image_tokens"] for s in samples]).astype(np.int32),
            "per_group_tokens": np.stack([s["per_group_tokens"] for s in samples]).astype(np.int32),
            "zs_preds": np.asarray([s["zs_pred"] for s in samples], np.int32),
            "gt_labels": np.asarray([s["gt"] for s in samples], np.int32),
        }
        remaining -= valid
        gw, preds = weights_fn(
            params,
            jnp.asarray(batch["images"]),
            jnp.asarray(batch["per_image_tokens"]),
            jnp.asarray(batch["per_group_tokens"]),
            jnp.asarray(batch["zs_preds"]),
        )
        gw, preds = np.asarray(gw)[:valid], np.asarray(preds)[:valid]
        group_weights.append(gw)
        for row in range(len(gw)):
            zs = int(batch["zs_preds"][row])
            gt = int(batch["gt_labels"][row])
            items.append(
                {
                    "zs_lb": data.class_names[zs],
                    "ft_lb": data.class_names[int(preds[row])],
                    "gt_lb": data.class_names[gt] if gt >= 0 else "",
                    "per_image_text": tokenizer.decode(
                        [t for t in batch["per_image_tokens"][row] if 0 < t < 49406]
                    ).strip(),
                    "per_image_group_text": tokenizer.decode(
                        [t for t in batch["per_group_tokens"][row] if 0 < t < 49406]
                    ).strip(),
                }
            )

    all_weights = np.concatenate(group_weights)
    np.save(os.path.join(out_dir, "group_weights.npy"), all_weights)
    with open(os.path.join(out_dir, "all_labels.json"), "w") as f:
        json.dump(items, f, indent=2)
    logger.info("saved %d group weights + labels to %s", len(all_weights), out_dir)
    return all_weights
