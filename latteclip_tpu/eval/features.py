"""Pseudo-label extraction: the ``clip_features_<split>.pkl`` job.

Reproduces the reference's ``extract_features``
(``src/training/train.py:1310-1382``): build the dataset-template zero-shot
classifier, run frozen CLIP over a split, and dump a pickle mapping
``image_id -> {image, top_class_ids, class_names, top_logit, gt_classname,
gt_class_id}`` — the join key of the whole system (caption generation, the
train-data caption join and ``zeroshot_preds`` all consume this file,
reference ``data.py:399-451``, ``train.py:416-417``). The output format is
byte-compatible (pickled dict of numpy arrays/lists).
"""
from __future__ import annotations

import logging
import os
import pickle
from typing import Dict

import jax.numpy as jnp
import numpy as np

from latteclip_tpu.core.config import CLIPConfig
from latteclip_tpu.data.eval_dataset import FlatFileDataset, iter_batches
from latteclip_tpu.eval.zero_shot import (
    build_zero_shot_classifier,
    make_eval_step,
    topk_counts,
)
from latteclip_tpu.models.tokenizer import ClipTokenizer
from latteclip_tpu.core.mesh import tpu_jit

logger = logging.getLogger(__name__)


def extract_features(
    params,
    cfg: CLIPConfig,
    tokenizer: ClipTokenizer,
    dataset: FlatFileDataset,
    out_dir: str,
    split: str,
    *,
    batch_size: int = 64,
    topk: int = 10,
) -> Dict[str, dict]:
    classnames = dataset.display_class_names
    classifier = build_zero_shot_classifier(
        params, cfg, tokenizer, classnames, dataset.templates
    )
    step = make_eval_step(params, cfg, classifier)

    # also collect normalized image features for the pkl
    import jax

    from latteclip_tpu.data import transforms as T
    from latteclip_tpu.models import clip as clip_mod

    @tpu_jit
    def feat_and_logits(p, images_u8):
        images = T.normalize_images(images_u8, *T.model_mean_std(cfg))
        feats = clip_mod.encode_image(p, cfg, images, normalize=True)
        return feats, 100.0 * feats @ classifier

    features: Dict[str, dict] = {}
    top1 = top5 = top10 = n = 0.0
    for ids, images, labels, valid in iter_batches(dataset, batch_size, pad_final=True):
        feats, logits = feat_and_logits(params, jnp.asarray(images))
        feats = np.asarray(feats)[:valid]
        logits = np.asarray(logits)[:valid]
        a1, a5, a10 = topk_counts(logits, labels[:valid])
        top1 += a1
        top5 += a5
        top10 += a10
        n += valid
        order = np.argsort(-logits, axis=1)[:, :topk]
        top_logits = np.take_along_axis(logits, order, axis=1)
        for row in range(valid):
            image_id = ids[row]
            gt = int(labels[row])
            features[image_id] = {
                "image": feats[row],
                "top_class_ids": order[row],
                "class_names": [classnames[i] for i in order[row]],
                "top_logit": top_logits[row],
                "gt_classname": classnames[gt],
                "gt_class_id": gt,
            }
    if n == 0:
        raise ValueError(f"extract_features[{split}]: dataset produced no samples")
    logger.info(
        "extract_features[%s]: n=%d top1=%.4f top5=%.4f top10=%.4f",
        split, int(n), top1 / n, top5 / n, top10 / n,
    )
    os.makedirs(out_dir, exist_ok=True)
    save_path = os.path.join(out_dir, f"clip_features_{split}.pkl")
    with open(save_path, "wb") as f:
        pickle.dump(features, f)
    logger.info("saved features to %s", save_path)
    return features
