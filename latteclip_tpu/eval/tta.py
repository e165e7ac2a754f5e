"""Test-time adaptation: TPT (entropy minimization) and RLCF (CLIP rewards).

Reproduces the reference's TTA evaluation paths
(``src/training/train.py:1141-1305``, ``src/open_clip/model.py:971-1213``):

* a learnable prompt context (``n_ctx`` vectors, initialised from a phrase
  like "a photo of a") is spliced between SOT and the class tokens
  (PromptLearner semantics, model.py:995-1213, 'end' token position);
* per test image, 1 + 63 AugMix views are encoded once (frozen towers);
* **TPT**: pick the most-confident ``selection_p`` fraction of views (lowest
  prediction entropy, train.py:285-288), minimize the marginal entropy of
  their averaged prediction (``avg_entropy``, train.py:1175-1180) w.r.t. the
  context for ``tta_steps`` AdamW steps, then classify the base view;
* **RLCF**: rewards from a frozen (usually larger) CLIP — CLIPScore between
  the reward model's image features of the selected views and its class text
  features of the top-k sampled classes, mean-centered per view
  (train.py:1141-1172, model.py:97-131); the context maximizes
  reward-weighted log-likelihood.

TPU shape discipline: the view batch (64) and the selected subset size are
static, so both phases are single jitted functions; per-image "optimizer
reset" is simply re-entering the jit with the initial context (the functional
equivalent of the reference's deepcopy'd optimizer state, train.py:1238,1274).
"""
from __future__ import annotations

import dataclasses
import logging
from typing import Dict, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
import optax

from latteclip_tpu.core.config import CLIPConfig
from latteclip_tpu.data import transforms as T
from latteclip_tpu.data.augmix import augmix_views
from latteclip_tpu.data.eval_dataset import FlatFileDataset
from latteclip_tpu.models import clip as clip_mod
from latteclip_tpu.models.layers import l2_normalize
from latteclip_tpu.models.text import text_forward_embeds
from latteclip_tpu.models.tokenizer import ClipTokenizer
from latteclip_tpu.core.mesh import tpu_jit

logger = logging.getLogger(__name__)


@dataclasses.dataclass
class PromptContext:
    """Tokenized class prompts with an insertable learnable context."""

    tokens: jnp.ndarray       # [C, ctx] ids of "X"*n_ctx + classname prompts
    init_ctx: jnp.ndarray     # [n_ctx, D] initial context vectors
    n_ctx: int

    @property
    def eot_pos(self) -> jnp.ndarray:
        return self.tokens.argmax(axis=-1)


def build_prompt_context(
    params,
    cfg: CLIPConfig,
    tokenizer: ClipTokenizer,
    classnames: Sequence[str],
    ctx_init: str = "a photo of a",
    n_ctx: int = 4,
) -> PromptContext:
    """PromptLearner init (model.py:1014-1047): context vectors from the
    embedding of ``ctx_init`` (defining n_ctx), placeholder 'X' prompts."""
    init_words = ctx_init.replace("_", " ").split()
    n_ctx = len(init_words) if ctx_init else n_ctx
    prefix = " ".join(["X"] * n_ctx)
    tokens = tokenizer([f"{prefix} {c}." for c in classnames])
    table = np.asarray(params["text"]["token_embedding"])
    if ctx_init:
        init_ids = tokenizer.encode(" ".join(init_words))
        assert len(init_ids) == n_ctx, (init_ids, n_ctx)
        init_ctx = table[np.asarray(init_ids)]
    else:
        init_ctx = 0.02 * np.random.RandomState(0).randn(n_ctx, table.shape[1])
    return PromptContext(
        tokens=jnp.asarray(tokens),
        init_ctx=jnp.asarray(init_ctx, jnp.float32),
        n_ctx=n_ctx,
    )


def prompt_text_features(params, cfg: CLIPConfig, prompt: PromptContext, ctx: jnp.ndarray):
    """Splice ctx into the class prompts and encode -> [C, E] normalized."""
    embeds = params["text"]["token_embedding"][prompt.tokens]          # [C, L, D]
    C = embeds.shape[0]
    ctx_b = jnp.broadcast_to(ctx[None], (C, prompt.n_ctx, ctx.shape[-1]))
    spliced = jnp.concatenate(
        [embeds[:, :1], ctx_b.astype(embeds.dtype), embeds[:, 1 + prompt.n_ctx:]], axis=1
    )
    feats = text_forward_embeds(
        params["text"], cfg.text, spliced, prompt.eot_pos,
        dtype=jnp.dtype(cfg.compute_dtype), quick_gelu=cfg.quick_gelu,
    )
    return l2_normalize(feats)


def avg_entropy(logits: jnp.ndarray) -> jnp.ndarray:
    """Entropy of the mean prediction (reference train.py:1175-1180)."""
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    avg_logp = jax.nn.logsumexp(logp, axis=0) - jnp.log(logits.shape[0] * 1.0)
    return -jnp.sum(avg_logp * jnp.exp(avg_logp))


def select_confident(logits: jnp.ndarray, selection_p: float) -> jnp.ndarray:
    """Indices of the lowest-entropy fraction (train.py:285-288), static size."""
    probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
    entropy = -jnp.sum(probs * jnp.log(probs + 1e-12), axis=-1)
    k = max(1, int(logits.shape[0] * selection_p))
    return jax.lax.top_k(-entropy, k)[1]


@dataclasses.dataclass
class TTAConfig:
    n_views: int = 63
    selection_p: float = 0.1
    tta_steps: int = 1
    lr: float = 5e-3
    weight_decay: float = 5e-4
    ctx_init: str = "a photo of a"
    sample_k: int = 5              # RLCF top-k class sampling
    clipscore_weight: float = 2.5  # RLCF CLIPScore scale (model.py:85)


def make_tpt_adapt_fn(params, cfg: CLIPConfig, prompt: PromptContext, tta: TTAConfig):
    """One jitted function: view features -> tuned ctx -> base-view logits."""
    opt = optax.adamw(tta.lr, weight_decay=tta.weight_decay)

    def logits_of(ctx, feats):
        text = prompt_text_features(params, cfg, prompt, ctx)
        return jnp.exp(params["logit_scale"]) * feats @ text.T

    def adapt(view_feats: jnp.ndarray) -> jnp.ndarray:
        ctx = prompt.init_ctx
        opt_state = opt.init(ctx)
        # confident-view selection is done once, on the initial prompts
        selected = select_confident(logits_of(ctx, view_feats), tta.selection_p)
        sel_feats = view_feats[selected]

        def step(carry, _):
            ctx, opt_state = carry
            loss, grads = jax.value_and_grad(
                lambda c: avg_entropy(logits_of(c, sel_feats))
            )(ctx)
            updates, opt_state = opt.update(grads, opt_state, ctx)
            return (optax.apply_updates(ctx, updates), opt_state), loss

        (ctx, _), _ = jax.lax.scan(step, (ctx, opt_state), None, length=tta.tta_steps)
        return logits_of(ctx, view_feats[:1])[0]

    return tpu_jit(adapt)


def make_rlcf_adapt_fn(
    params, cfg: CLIPConfig,
    reward_params, reward_cfg: CLIPConfig,
    prompt: PromptContext, tta: TTAConfig,
    reward_class_features: jnp.ndarray,   # [C, E] frozen reward-model text feats
):
    """RLCF: reward-weighted CE over top-k sampled classes (train.py:1141-1172)."""
    opt = optax.adamw(tta.lr, weight_decay=tta.weight_decay)

    def logits_of(ctx, feats):
        text = prompt_text_features(params, cfg, prompt, ctx)
        return jnp.exp(params["logit_scale"]) * feats @ text.T

    def adapt(view_feats: jnp.ndarray, reward_view_feats: jnp.ndarray) -> jnp.ndarray:
        ctx = prompt.init_ctx
        opt_state = opt.init(ctx)
        selected = select_confident(logits_of(ctx, view_feats), tta.selection_p)
        sel_feats = view_feats[selected]
        sel_reward_feats = reward_view_feats[selected]

        def step(carry, _):
            ctx, opt_state = carry

            def loss_fn(c):
                out = logits_of(c, sel_feats)                       # [S, C]
                _vals, idx = jax.lax.top_k(out, tta.sample_k)       # [S, K]
                # CLIPScore rewards from the frozen reward model
                txt = reward_class_features[idx]                    # [S, K, E]
                score = tta.clipscore_weight * jnp.einsum("se,ske->sk", sel_reward_feats, txt)
                score = jnp.maximum(score, 0.0)
                rewards = score - jnp.mean(score, axis=-1, keepdims=True)  # center per view
                logp = jax.nn.log_softmax(out.astype(jnp.float32), axis=-1)
                ce = -jnp.take_along_axis(logp, idx, axis=-1)       # [S, K]
                return jnp.mean(jax.lax.stop_gradient(rewards.reshape(-1)) * ce.reshape(-1))

            loss, grads = jax.value_and_grad(loss_fn)(ctx)
            updates, opt_state = opt.update(grads, opt_state, ctx)
            return (optax.apply_updates(ctx, updates), opt_state), loss

        (ctx, _), _ = jax.lax.scan(step, (ctx, opt_state), None, length=tta.tta_steps)
        return logits_of(ctx, view_feats[:1])[0]

    return tpu_jit(adapt)


def evaluate_tta(
    params,
    cfg: CLIPConfig,
    tokenizer: ClipTokenizer,
    dataset: FlatFileDataset,
    tta: TTAConfig = TTAConfig(),
    *,
    method: str = "tpt",
    reward_params=None,
    reward_cfg: Optional[CLIPConfig] = None,
    max_samples: Optional[int] = None,
    seed: int = 0,
) -> Dict[str, float]:
    """Per-image TTA evaluation (reference evaluate_tta, train.py:1216-1305)."""
    classnames = dataset.display_class_names
    prompt = build_prompt_context(params, cfg, tokenizer, classnames, tta.ctx_init)

    @tpu_jit
    def encode_views(p, views_u8):
        return clip_mod.encode_image(p, cfg, T.normalize_images(views_u8, *T.model_mean_std(cfg)), normalize=True)

    if method == "rlcf":
        assert reward_params is not None and reward_cfg is not None
        label_texts = [dataset.templates[0](c) for c in classnames]
        reward_class_features = clip_mod.encode_text(
            reward_params, reward_cfg, jnp.asarray(tokenizer(label_texts)), normalize=True
        )
        adapt = make_rlcf_adapt_fn(
            params, cfg, reward_params, reward_cfg, prompt, tta, reward_class_features
        )

        @tpu_jit
        def encode_reward_views(p, views_u8):
            return clip_mod.encode_image(p, reward_cfg, T.normalize_images(views_u8, *T.model_mean_std(reward_cfg)), normalize=True)
    else:
        adapt = make_tpt_adapt_fn(params, cfg, prompt, tta)

    rng = np.random.default_rng(seed)
    top1 = top5 = n = 0.0
    total = min(len(dataset), max_samples or len(dataset))
    for index in range(total):
        image_id = dataset.image_ids[index]
        # the dataset owns its storage layout/extension (works for any
        # dataset exposing load_image; FlatFileDataset, ImageFolderDataset)
        img = dataset.load_image(index)
        label = dataset.label_of(image_id)
        views = jnp.asarray(augmix_views(img, dataset.image_size, tta.n_views, rng))
        feats = encode_views(params, views)
        if method == "rlcf":
            logits = np.asarray(adapt(feats, encode_reward_views(reward_params, views)))
        else:
            logits = np.asarray(adapt(feats))
        order = np.argsort(-logits)
        top1 += float(order[0] == label)
        top5 += float(label in order[:5])
        n += 1
    return {"tta_top1": top1 / n, "tta_top5": top5 / n, "n": n}
