"""Zero-shot classification: classifier builders + top-k evaluation.

Parity targets: ``build_zero_shot_classifier`` (template texts per class,
mean over templates, L2-normalize, stack to ``[D, C]`` — reference
``src/open_clip/zero_shot_classifier.py:23-73``), the prototype classifier
built from the memory bank (reference ``src/training/zero_shot.py:139-145``)
and the eval loop ``logits = 100 * img_feat @ classifier`` with top-1/5/10
accuracy (``zero_shot.py:23-52``).

TPU-first differences: all class template texts are tokenized once up front
into one ``[C*T, 77]`` array and encoded in fixed-size chunks under a single
jit; the eval loop consumes uint8 host batches and fuses normalize + encode
+ logits + top-k in one compiled function per batch shape.
"""
from __future__ import annotations

from typing import Callable, Dict, List, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from latteclip_tpu.core.config import CLIPConfig
from latteclip_tpu.data import transforms as T
from latteclip_tpu.models import clip as clip_mod
from latteclip_tpu.models.layers import l2_normalize
from latteclip_tpu.models.tokenizer import ClipTokenizer
from latteclip_tpu.core.mesh import tpu_jit


def tokenize_class_templates(
    tokenizer: ClipTokenizer,
    classnames: Sequence[str],
    templates: Sequence[Callable[[str], str]],
) -> np.ndarray:
    """[C*T, ctx] int32 token table, class-major (templates contiguous)."""
    texts = [t(c) for c in classnames for t in templates]
    return tokenizer(texts)


def build_zero_shot_classifier(
    params,
    cfg: CLIPConfig,
    tokenizer: ClipTokenizer,
    classnames: Sequence[str],
    templates: Sequence[Callable[[str], str]],
    *,
    chunk_classes: int = 64,
    packing: int = 0,
) -> jnp.ndarray:
    """Return classifier weights ``[D, C]`` (template-mean, L2-normalized).

    ``packing`` (e.g. 128, from ``--text-packing``): encode each chunk
    through the variable-length packed text tower (data/packing.py) —
    template texts are short (~10-16 BPE tokens of the 77-column rows), so
    the packed build touches ~len/77 of the padded tokens. Exact semantics
    (tests/test_packed_step.py); native argmax-pool CLIP text towers only.
    """
    num_templates = len(templates)
    tokens = tokenize_class_templates(tokenizer, classnames, templates)
    C = len(classnames)

    chunk = chunk_classes * num_templates
    blocks = []
    for start in range(0, C * num_templates, chunk):
        block = tokens[start : start + chunk]
        real = block.shape[0] // num_templates
        if block.shape[0] < chunk:  # pad to static shape, drop extras after
            pad = np.zeros((chunk - block.shape[0], block.shape[1]), block.dtype)
            block = np.concatenate([block, pad])
        blocks.append((block, real))

    if packing:
        from latteclip_tpu.data.packing import (
            pack_rows_needed,
            pack_token_rows,
            token_lengths,
        )

        if packing < tokens.shape[1]:
            raise ValueError(
                f"packing={packing} < token context {tokens.shape[1]}")
        # one static row count for every chunk = one jit specialization
        rows = -(-max(
            pack_rows_needed(token_lengths(b), packing) for b, _ in blocks
        ) // 8) * 8

        @tpu_jit
        def encode_chunk(p, tok, pos, seg, er, ec):
            feats = clip_mod.encode_text_packed(
                p, cfg, tok, pos, seg, er, ec, normalize=True)
            feats = feats.reshape(-1, num_templates, feats.shape[-1]).mean(axis=1)
            return l2_normalize(feats)

        def run_chunk(block):
            pk = pack_token_rows(block, token_lengths(block), packing, rows=rows)
            return encode_chunk(params, pk.tokens, pk.positions, pk.seg_ids,
                                pk.eot_row, pk.eot_col)
    else:
        @tpu_jit
        def encode_chunk(p, chunk_tokens):
            feats = clip_mod.encode_text(p, cfg, chunk_tokens, normalize=True)
            feats = feats.reshape(-1, num_templates, feats.shape[-1]).mean(axis=1)
            return l2_normalize(feats)

        def run_chunk(block):
            return encode_chunk(params, block)

    outs = [np.asarray(run_chunk(block))[:real] for block, real in blocks]
    weights = np.concatenate(outs)  # [C, D]
    return jnp.asarray(weights.T)  # [D, C]


def prototype_classifier(memory_bank: jnp.ndarray) -> jnp.ndarray:
    """Memory bank [C, D] -> normalized classifier [D, C] (zero_shot.py:139-145)."""
    return l2_normalize(jnp.asarray(memory_bank)).T


def make_eval_step(params, cfg: CLIPConfig, classifier: jnp.ndarray):
    """Compiled fused step: uint8 images -> (logits f32 [B, C])."""

    @tpu_jit
    def step(p, images_u8):
        images = T.normalize_images(images_u8, *T.model_mean_std(cfg))
        feats = clip_mod.encode_image(p, cfg, images, normalize=True)
        return 100.0 * feats @ classifier
    return lambda images_u8: step(params, images_u8)


def topk_counts(logits: np.ndarray, target: np.ndarray, ks=(1, 5, 10)) -> List[float]:
    """Count of targets within top-k predictions (reference zero_shot.py:14-20)."""
    order = np.argsort(-logits, axis=1)
    out = []
    for k in ks:
        out.append(float((order[:, :k] == target[:, None]).any(axis=1).sum()))
    return out


def run_zero_shot_eval(
    params,
    cfg: CLIPConfig,
    classifier: jnp.ndarray,
    batches,
) -> Dict[str, float]:
    """Evaluate top-1/5/10 over an iterator of (ids, uint8, labels, valid)."""
    step = make_eval_step(params, cfg, classifier)
    top1 = top5 = top10 = n = 0.0
    for _ids, images, labels, valid in batches:
        logits = np.asarray(step(jnp.asarray(images)))[:valid]
        a1, a5, a10 = topk_counts(logits, labels[:valid])
        top1 += a1
        top5 += a5
        top10 += a10
        n += valid
    if n == 0:
        raise ValueError(
            "zero-shot eval received no samples — empty val split or a "
            "filter that dropped every image"
        )
    return {"top1": top1 / n, "top5": top5 / n, "top10": top10 / n, "n": n}
