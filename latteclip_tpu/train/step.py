"""The LatteCLIP training step — one fused, jittable function.

Implements the algorithm of the reference's ``train_one_epoch_v2`` inner
loop (``src/training/train.py:358-565``) as a single pure function:

  1. augment+normalize uint8 images (fused into the step);
  2. image forward → prototype-classifier logits → fine-tune pseudo-labels;
  3. ONE batched text forward over ``[4B, 77]`` tokens — template(preds),
     template(zs_preds), per-image caption, per-group caption — replacing the
     reference's four separate ``encode_text`` calls (train.py:437-442);
  4. confidence-weighted caption fusion (top1−top2 margin vs the epoch
     prototypes, gated by use_{template,image,batch}_caption —
     train.py:444-484; two latent reference bugs are fixed by default and
     replayable via ``bug_compat`` — see ``fuse_text_streams``);
  5. prototype anchoring ``proto + α (fused − proto)`` (train.py:487-488);
  6. two symmetric InfoNCE losses (fine-tune + zero-shot branches,
     train.py:491-504);
  7. grads + AdamW update, logit-scale clamp to [0, ln 100] (train.py:563-565);
  8. memory-bank update: per-class mean of this batch's anchored text
     features over both branches, renormalized; unseen classes keep their
     rows (replaces the reference's Python dict loop, train.py:508-530).

Read-before-write dataflow note: the classifier/anchor reads happen before
the bank write, from the same batch, exactly as in the reference.

The "FLYP" baseline step (``train_one_epoch_original_clip``,
train.py:76-284) is also provided: plain InfoNCE against template texts of
the pseudo-label (or ground truth).
"""
from __future__ import annotations

import dataclasses
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from latteclip_tpu.core.config import CLIPConfig
from latteclip_tpu.data import transforms as T
from latteclip_tpu.models import clip as clip_mod
from latteclip_tpu.models.layers import l2_normalize
from latteclip_tpu.train.objective import clip_loss, text_confidence_weights
from latteclip_tpu.train.state import TrainState

LOG100 = 4.6051702  # ln(100), reference train.py:563-565
WEIGHT_EPS = 1e-6   # reference train.py:444-449


@dataclasses.dataclass(frozen=True)
class LatteHParams:
    """Static hyperparameters of the v2 objective (reference params.py flags)."""

    alpha: float = 0.01                 # prototype blend, params.py:408-412
    use_template_caption: float = 1.0   # params.py:43-75 gates
    use_image_caption: float = 1.0
    use_batch_caption: float = 1.0
    use_zeroshot_pseudolabel: float = 1.0
    use_finetune_pseudolabel: float = 1.0
    remat: bool = False                 # grad checkpointing (off: TPU HBM fits)
    remat_text: Optional[bool] = None   # per-tower override; None -> follow remat
    remat_vision: Optional[bool] = None  # per-tower override; None -> follow remat
    augment: bool = True
    bug_compat: bool = False            # replay the reference's fusion quirks (below)
    # ONE text forward over [C+2B, 77] (templates + both caption streams,
    # zero-padded to a multiple of 8 rows) instead of two — value- and
    # gradient-identical, one kernel launch and a bigger GEMM batch
    fuse_text_fwd: bool = False
    # True variable-length packing (--text-packing): the batch carries
    # cap_{tokens,positions,seg_ids,eot_row,eot_col} from data.packing and
    # the caption streams run through the segment-masked packed tower
    # (~sum(len) tokens instead of 2B*ctx); templates pack statically at
    # step build. Numerically equivalent to the padded path (causal mask +
    # EOT pooling; tests/test_packed_step.py pins step-level equivalence).
    text_packing: bool = False

    @property
    def text_remat(self) -> bool:
        return self.remat if self.remat_text is None else self.remat_text

    @property
    def vision_remat(self) -> bool:
        return self.remat if self.remat_vision is None else self.remat_vision


def _fuse(
    label_f, per_img_f, per_grp_f, w_label, w_img, w_grp
) -> jnp.ndarray:
    total = w_label + w_img + w_grp
    fused = (
        w_label[:, None] * label_f
        + w_img[:, None] * per_img_f
        + w_grp[:, None] * per_grp_f
    )
    return fused / total[:, None]


def fuse_text_streams(
    label_f, label_zs_f, per_img_f, per_grp_f,
    w_label_g, w_label_zs_g, w_img_g, w_grp_g,
    bug_compat: bool = False,
):
    """Confidence-weighted caption fusion for both branches (train.py:469-484).

    DELIBERATE DEVIATION from the reference (default ``bug_compat=False``):
    the reference's fusion block has two latent bugs that we fix by default
    but can replay exactly with ``bug_compat=True``:

    (a) The label-stream numerator multiplies ``label_text_weight`` ([B])
        into ``label_text_features`` ([B, E]) WITHOUT ``unsqueeze(1)``
        (train.py:474, 480) — torch broadcasting aligns trailing axes, so
        this only runs because the scripts pin batch == embed_dim == 512 and
        it then scales *embedding dimension j* by *sample j's* weight. The
        caption streams use ``.unsqueeze(1)`` (per-sample, as intended).
    (b) The zero-shot branch's numerator reuses the fine-tune branch's
        ``label_text_weight`` while its denominator uses
        ``label_text_weight_zeroshot`` (train.py:480 vs 471).

    The intended math (per-sample weights in both numerator and denominator,
    each branch self-consistent) is the default; the paper's numbers were
    produced WITH the bugs, so ``--fusion-bug-compat`` exists for bitwise
    parity experiments against reference-trained checkpoints. ``bug_compat``
    requires batch == embed_dim, exactly like the reference.
    (The reference's per-caption *zeroshot* weight variants are value-equal
    to the fine-tune ones — ``compute_text_weights`` ignores its ``preds``
    argument — so a single w_img/w_grp serves both branches here.)
    """
    if not bug_compat:
        text_fused = _fuse(label_f, per_img_f, per_grp_f, w_label_g, w_img_g, w_grp_g)
        text_fused_zs = _fuse(label_zs_f, per_img_f, per_grp_f, w_label_zs_g, w_img_g, w_grp_g)
        return text_fused, text_fused_zs

    B, E = label_f.shape
    if B != E:
        raise ValueError(
            f"bug_compat fusion requires batch == embed_dim (got {B} vs {E}); "
            "the reference's unbatched broadcast only runs at 512==512"
        )
    total = w_label_g + w_img_g + w_grp_g
    total_zs = w_label_zs_g + w_img_g + w_grp_g
    # (a): label weights broadcast along the EMBEDDING axis ([None, :])
    text_fused = (
        label_f * w_label_g[None, :]
        + w_img_g[:, None] * per_img_f
        + w_grp_g[:, None] * per_grp_f
    ) / total[:, None]
    # (b): zs numerator uses the FT label weight, zs denominator the zs one
    text_fused_zs = (
        label_zs_f * w_label_g[None, :]
        + w_img_g[:, None] * per_img_f
        + w_grp_g[:, None] * per_grp_f
    ) / total_zs[:, None]
    return text_fused, text_fused_zs


def latteclip_loss_fn(
    params,
    cfg: CLIPConfig,
    hp: LatteHParams,
    batch: Dict[str, jnp.ndarray],
    images: jnp.ndarray,
    memory_bank: jnp.ndarray,
    prototypes: jnp.ndarray,
    template_table: jnp.ndarray,
    template_packed: Optional[tuple] = None,
) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    zs_preds = batch["zs_preds"]

    image_features = clip_mod.encode_image(params, cfg, images, normalize=True, remat=hp.vision_remat)
    logit_scale = jnp.exp(params["logit_scale"])

    # fine-tune pseudo-labels from the live prototype classifier (train.py:384-411)
    classifier = l2_normalize(memory_bank)
    logits_cls = 100.0 * image_features @ classifier.T
    preds = jnp.argmax(logits_cls, axis=1)

    # Template streams: encode the C unique class templates ONCE and gather
    # rows — gradient-identical to encoding template_table[preds] per sample
    # (the gather's transpose scatter-adds the cotangents), but O(C) instead
    # of O(B) text-tower work for the label streams. The caption streams are
    # per-sample unique and batch into one forward.
    if hp.text_packing:
        # variable-length packed caption tower (--text-packing): run on
        # ~sum(len) tokens; sequence order [per_image, per_group] is pinned
        # by data.packing.pack_caption_batch
        B = zs_preds.shape[0]
        if template_packed is not None:
            class_text_feats = clip_mod.encode_text_packed(
                params, cfg, *template_packed,
                normalize=True, remat=hp.text_remat,
            )
        else:
            class_text_feats = clip_mod.encode_text(
                params, cfg, template_table, normalize=True, remat=hp.text_remat
            )
        caption_feats = clip_mod.encode_text_packed(
            params, cfg,
            batch["cap_tokens"], batch["cap_positions"], batch["cap_seg_ids"],
            batch["cap_eot_row"], batch["cap_eot_col"],
            normalize=True, remat=hp.text_remat,
        )
        per_img_f = caption_feats[:B]
        per_grp_f = caption_feats[B:]
    elif hp.fuse_text_fwd:
        # templates + both caption streams in ONE encode_text ([C+2B, 77]
        # padded to a multiple of 8 rows for the flash kernel's batch
        # grouping) — fewer launches, one bigger MXU-friendly GEMM batch
        C = template_table.shape[0]
        B = batch["per_image_tokens"].shape[0]
        all_tokens = jnp.concatenate(
            [template_table, batch["per_image_tokens"], batch["per_group_tokens"]],
            axis=0,
        )
        pad = (-all_tokens.shape[0]) % 8
        if pad:
            all_tokens = jnp.concatenate(
                [all_tokens, jnp.zeros((pad, all_tokens.shape[1]), all_tokens.dtype)],
                axis=0,
            )
        all_feats = clip_mod.encode_text(
            params, cfg, all_tokens, normalize=True, remat=hp.text_remat
        )
        class_text_feats = all_feats[:C]
        per_img_f = all_feats[C:C + B]
        per_grp_f = all_feats[C + B:C + 2 * B]
    else:
        class_text_feats = clip_mod.encode_text(
            params, cfg, template_table, normalize=True, remat=hp.text_remat
        )  # [C, E]
        caption_tokens = jnp.concatenate(
            [batch["per_image_tokens"], batch["per_group_tokens"]], axis=0
        )
        caption_feats = clip_mod.encode_text(
            params, cfg, caption_tokens, normalize=True, remat=hp.text_remat
        )
        per_img_f, per_grp_f = jnp.split(caption_feats, 2, axis=0)
    label_f = class_text_feats[preds]
    label_zs_f = class_text_feats[zs_preds]

    # confidence weights vs the epoch prototypes (detached), + gates
    w_img = text_confidence_weights(per_img_f, prototypes) + WEIGHT_EPS
    w_grp = text_confidence_weights(per_grp_f, prototypes) + WEIGHT_EPS
    w_label = text_confidence_weights(label_f, prototypes) + WEIGHT_EPS
    w_label_zs = text_confidence_weights(label_zs_f, prototypes) + WEIGHT_EPS

    w_img_g = w_img * hp.use_image_caption
    w_grp_g = w_grp * hp.use_batch_caption
    w_label_g = w_label * hp.use_template_caption
    w_label_zs_g = w_label_zs * hp.use_template_caption

    text_fused, text_fused_zs = fuse_text_streams(
        label_f, label_zs_f, per_img_f, per_grp_f,
        w_label_g, w_label_zs_g, w_img_g, w_grp_g, hp.bug_compat,
    )

    # prototype anchoring (train.py:487-488)
    anchor = memory_bank[preds]
    anchor_zs = memory_bank[zs_preds]
    text_final = anchor + hp.alpha * (text_fused - anchor)
    text_final_zs = anchor_zs + hp.alpha * (text_fused_zs - anchor_zs)

    loss_ft = clip_loss(image_features, text_final, logit_scale)
    loss_zs = clip_loss(image_features, text_final_zs, logit_scale) * hp.use_zeroshot_pseudolabel
    total = (loss_ft + loss_zs) * hp.use_finetune_pseudolabel

    aux = {
        "loss": total,
        "contrastive_loss": loss_ft,
        "zeroshot": loss_zs,
        "preds": preds,
        "text_final": jax.lax.stop_gradient(text_final),
        "text_final_zs": jax.lax.stop_gradient(text_final_zs),
        "logit_scale": logit_scale,
        "pseudo_agreement": jnp.mean((preds == zs_preds).astype(jnp.float32)),
    }
    return total, aux


def update_memory_bank(
    memory_bank: jnp.ndarray,
    preds: jnp.ndarray,
    zs_preds: jnp.ndarray,
    text_final: jnp.ndarray,
    text_final_zs: jnp.ndarray,
) -> jnp.ndarray:
    """Segment-mean bank update over both branches (train.py:508-530).

    Under a mesh the features/ids are batch-sharded while the bank is
    replicated; XLA turns the segment sums into psums, so every host applies
    the same global update — defining the synchronization the reference
    leaves undefined (its per-rank bank silently diverges, SURVEY §2.4).
    """
    C = memory_bank.shape[0]
    seg_ids = jnp.concatenate([zs_preds, preds])
    feats = jnp.concatenate([text_final_zs, text_final]).astype(jnp.float32)
    sums = jax.ops.segment_sum(feats, seg_ids, num_segments=C)
    counts = jax.ops.segment_sum(jnp.ones((feats.shape[0],), jnp.float32), seg_ids, num_segments=C)
    means = sums / jnp.maximum(counts, 1.0)[:, None]
    updated = l2_normalize(means)
    return jnp.where((counts > 0)[:, None], updated, memory_bank)


def make_train_step(
    cfg: CLIPConfig,
    optimizer: optax.GradientTransformation,
    hp: LatteHParams,
    template_table: jnp.ndarray,
    aug: Optional[T.AugConfig] = None,
    template_packed=None,
    zero_update_subtrees: Tuple[str, ...] = (),
):
    """Build the jittable LatteCLIP step: (state, batch, rng) -> (state, metrics).

    ``template_packed``: a ``data.packing.PackedText`` of the template table
    (static — packed once here) for the ``hp.text_packing`` path.

    ``zero_update_subtrees``: top-level param subtrees whose optimizer
    updates are zeroed each step — params the objective never touches (e.g.
    CoCa's caption decoder under the v2 objective). Torch optimizers SKIP
    grad=None params entirely (no step, no weight decay); our zero
    cotangents would still incur AdamW decay, so the updates are zeroed to
    reproduce the skip exactly (same device trick as the v1 text freeze).
    """
    aug = aug or T.AugConfig()
    template_table = jnp.asarray(template_table)
    if template_packed is not None:
        template_packed = tuple(jnp.asarray(a) for a in template_packed)

    def step_fn(state: TrainState, batch: Dict[str, jnp.ndarray], rng: jax.Array):
        mean, std = T.model_mean_std(cfg)
        if hp.augment:
            images = T.train_augment_normalize(
                batch["images"], rng, aug, mean=mean, std=std,
                boxes=batch.get("crop_boxes"), size=cfg.vision.image_size,
            )
        else:
            images = T.normalize_images(batch["images"], mean=mean, std=std)

        grad_fn = jax.value_and_grad(latteclip_loss_fn, has_aux=True)
        (loss, aux), grads = grad_fn(
            state.params, cfg, hp, batch, images,
            state.memory_bank, state.prototypes, template_table,
            template_packed,
        )

        updates, opt_state = optimizer.update(grads, state.opt_state, state.params)
        for sub in zero_update_subtrees:
            updates = dict(
                updates, **{sub: jax.tree.map(jnp.zeros_like, updates[sub])}
            )
        params = optax.apply_updates(state.params, updates)
        params = dict(params, logit_scale=jnp.clip(params["logit_scale"], 0.0, LOG100))

        bank = update_memory_bank(
            state.memory_bank, aux["preds"], batch["zs_preds"],
            aux["text_final"], aux["text_final_zs"],
        )

        new_state = state.replace(
            step=state.step + 1,
            params=params,
            opt_state=opt_state,
            memory_bank=bank,
        )
        metrics = {
            "loss": loss,
            "contrastive_loss": aux["contrastive_loss"],
            "zeroshot": aux["zeroshot"],
            "logit_scale": aux["logit_scale"],
            "pseudo_agreement": aux["pseudo_agreement"],
        }
        return new_state, metrics

    return step_fn


# ---------------------------------------------------------------------------
# Legacy v1 trainer (train_one_epoch, train.py:811-1126) — the --gamma path
# ---------------------------------------------------------------------------

def v1_loss_fn(params, cfg, hp, batch, images, memory_bank, template_table):
    """Loss of the reference's legacy ``train_one_epoch`` (train.py:811-1126).

    Semantics at the reference's effective configuration (``w = 1.0`` at
    train.py:898, k = 1 pseudo-label per image — the ``squeeze(1)`` at
    train.py:938 only type-checks at k == 1):

    * the text stream is the TEMPLATE feature of the zero-shot pseudo-label
      alone (w=1.0 makes the caption mixing degenerate, train.py:899);
    * if the bank is initialized (gathered rows not all-zero,
      train.py:916-925): anchor ``normalize(bank) + α(text − normalize(bank))``
      — note the bank rows are re-normalized here because v1's bank update
      does NOT renormalize; else the anchor is the raw label feature;
    * the anchored text is **detached** (train.py:928-929: "important to not
      train the text_features") — only the image tower and logit_scale train;
    * symmetric InfoNCE between normalized image features and the normalized
      detached anchor (train.py:931-938).

    Returns the loss and the arrays the γ bank update needs.
    """
    image_features = clip_mod.encode_image(params, cfg, images, normalize=True, remat=hp.vision_remat)
    logit_scale = jnp.exp(params["logit_scale"])
    zs_preds = batch["zs_preds"]

    class_text_feats = clip_mod.encode_text(
        params, cfg, template_table, normalize=True, remat=hp.text_remat
    )
    label_f = class_text_feats[zs_preds]            # [B, E], unit rows

    bank_rows = memory_bank[zs_preds]               # [B, E]
    # train.py:916: `if membank_features.sum() != 0` over the GATHERED rows
    initialized = jnp.sum(bank_rows) != 0.0
    bank_norm = l2_normalize(bank_rows)
    anchored = jnp.where(
        initialized,
        bank_norm + hp.alpha * (label_f - bank_norm),  # train.py:921-925
        label_f,                                       # train.py:926-927 (init)
    )
    anchored = jax.lax.stop_gradient(anchored)         # train.py:928-929

    loss = clip_loss(image_features, l2_normalize(anchored), logit_scale)
    aux = {
        "loss": loss,
        "contrastive_loss": loss,
        "logit_scale": logit_scale,
        "anchored": anchored,                           # PRE-normalize, like temp_bank's input
        "image_features": jax.lax.stop_gradient(image_features),
    }
    return loss, aux


def v1_update_memory_bank(
    memory_bank: jnp.ndarray,
    zs_preds: jnp.ndarray,
    anchored: jnp.ndarray,
    image_features: jnp.ndarray,
    gamma: float,
) -> jnp.ndarray:
    """The γ momentum-prototype update of v1 (train.py:941-961).

    Per sample: ``anchored·(1−γ) + normalized_image_feature·γ`` (the EMA
    pseudo-label update the flag exists for, momentum mix at train.py:953),
    then a per-class MEAN over the batch — WITHOUT renormalization
    (train.py:960-961 assigns ``temp_bank/cnt`` directly; contrast v2's
    renormalized update). Unseen classes keep their rows. The reference
    mixes the PRE-normalized anchored feature (``membank_features_text_
    features[i][j]``), not the normalized copy used in the loss.
    """
    C = memory_bank.shape[0]
    feats = (anchored * (1.0 - gamma) + image_features * gamma).astype(jnp.float32)
    sums = jax.ops.segment_sum(feats, zs_preds, num_segments=C)
    counts = jax.ops.segment_sum(jnp.ones((feats.shape[0],), jnp.float32), zs_preds, num_segments=C)
    means = sums / jnp.maximum(counts, 1.0)[:, None]
    return jnp.where((counts > 0)[:, None], means, memory_bank)


def make_v1_step(
    cfg: CLIPConfig,
    optimizer: optax.GradientTransformation,
    hp: LatteHParams,
    template_table: jnp.ndarray,
    gamma: float,
    aug: Optional[T.AugConfig] = None,
):
    """Build the legacy-v1 (γ momentum prototype) step.

    The reference CLI cannot reach ``train_one_epoch`` (its main.py:502-511
    dispatches "ours" to v2 unconditionally), but the γ EMA prototype update
    only exists there — so here ``--gamma != 0`` selects this step instead of
    silently doing nothing. A/B'd against the reference's REAL
    ``train_one_epoch`` in tests/test_reference_driver_oracle.py.
    """
    aug = aug or T.AugConfig()
    template_table = jnp.asarray(template_table)

    def step_fn(state: TrainState, batch: Dict[str, jnp.ndarray], rng: jax.Array):
        mean, std = T.model_mean_std(cfg)
        if hp.augment:
            images = T.train_augment_normalize(
                batch["images"], rng, aug, mean=mean, std=std,
                boxes=batch.get("crop_boxes"), size=cfg.vision.image_size,
            )
        else:
            images = T.normalize_images(batch["images"], mean=mean, std=std)

        grad_fn = jax.value_and_grad(v1_loss_fn, has_aux=True)
        (loss, aux), grads = grad_fn(
            state.params, cfg, hp, batch, images, state.memory_bank, template_table
        )
        updates, opt_state = optimizer.update(grads, state.opt_state, state.params)
        # the detached anchor leaves the reference's text params with
        # grad=None, which torch optimizers SKIP (no step, no weight decay);
        # our zero cotangents would still incur AdamW weight decay — zero the
        # text-subtree updates to reproduce the skip exactly
        updates = dict(updates, text=jax.tree.map(jnp.zeros_like, updates["text"]))
        params = optax.apply_updates(state.params, updates)
        params = dict(params, logit_scale=jnp.clip(params["logit_scale"], 0.0, LOG100))
        bank = v1_update_memory_bank(
            state.memory_bank, batch["zs_preds"], aux["anchored"],
            aux["image_features"], gamma,
        )
        new_state = state.replace(
            step=state.step + 1, params=params, opt_state=opt_state, memory_bank=bank
        )
        metrics = {
            "loss": loss,
            "contrastive_loss": aux["contrastive_loss"],
            "logit_scale": aux["logit_scale"],
        }
        return new_state, metrics

    return step_fn


# ---------------------------------------------------------------------------
# FLYP baseline (train_one_epoch_original_clip, train.py:76-284)
# ---------------------------------------------------------------------------

def flyp_loss_fn(params, cfg, hp, batch, images, template_table, use_gt: bool,
                 use_siglip: bool = False, teacher=None, coca_weights=None):
    labels = batch["gt_labels"] if use_gt else batch["zs_preds"]
    if coca_weights is not None:
        # CoCa fine-tune: full forward (contrastive latents + caption
        # decoder) on the per-sample template text of the (pseudo-)label,
        # CoCaLoss = clip_w * InfoNCE + caption_w * CE — the reference's
        # create_loss dispatch for "coca" models (factory.py:325-331 ->
        # loss.py:278-321) under train_one_epoch_original_clip. Per-sample
        # forwards (no template dedup): the caption decoder cross-attends
        # each sample's own image tokens, exactly like the reference.
        from latteclip_tpu.models.coca import coca_forward, coca_loss

        caption_w, clip_w = coca_weights
        tokens = template_table[labels]
        out = coca_forward(params, cfg, images, tokens)
        losses = coca_loss(out, caption_loss_weight=caption_w,
                           clip_loss_weight=clip_w, pad_id=cfg.pad_id)
        loss = losses["contrastive_loss"] + losses["caption_loss"]
        return loss, {
            "loss": loss,
            "contrastive_loss": losses["contrastive_loss"],
            "caption_loss": losses["caption_loss"],
            "logit_scale": out["logit_scale"],
        }
    image_features = clip_mod.encode_image(params, cfg, images, normalize=True, remat=hp.vision_remat)
    # encode unique class templates once, gather rows (gradient-identical)
    class_text_feats = clip_mod.encode_text(
        params, cfg, template_table, normalize=True, remat=hp.text_remat
    )
    text_features = class_text_feats[labels]
    logit_scale = jnp.exp(params["logit_scale"])
    if use_siglip:
        # reference create_loss --siglip branch (factory.py:337-341 ->
        # loss.py:365-560); full-matrix form is GSPMD-safe under the mesh,
        # the ring variant (objective.siglip_ring_loss) is value+grad
        # equivalent (tested on 8 devices)
        from latteclip_tpu.train.objective import siglip_full_loss

        logit_bias = params.get("logit_bias", jnp.asarray(-10.0))
        loss = siglip_full_loss(image_features, text_features, logit_scale, logit_bias)
    else:
        loss = clip_loss(image_features, text_features, logit_scale)
    metrics = {"contrastive_loss": loss, "logit_scale": logit_scale}
    if teacher is not None:
        # --distill-model/--distill-pretrained (reference main.py:213-219,
        # 265-272; DistillClipLoss loss.py:324-362): a frozen teacher scores
        # the same batch; its soft logit targets are added to the loss
        from latteclip_tpu.train.objective import distill_clip_loss

        teacher_cfg, teacher_params = teacher
        t_img = jax.lax.stop_gradient(
            clip_mod.encode_image(teacher_params, teacher_cfg, images, normalize=True)
        )
        t_cls = jax.lax.stop_gradient(
            clip_mod.encode_text(teacher_params, teacher_cfg, template_table, normalize=True)
        )
        t_txt = t_cls[labels]
        t_scale = jnp.exp(teacher_params["logit_scale"])
        d_loss = distill_clip_loss(
            image_features, text_features, logit_scale, t_img, t_txt, t_scale
        )
        loss = loss + d_loss
        metrics["distill_loss"] = d_loss
    metrics["loss"] = loss
    return loss, metrics


def make_flyp_step(
    cfg: CLIPConfig,
    optimizer: optax.GradientTransformation,
    hp: LatteHParams,
    template_table: jnp.ndarray,
    use_gt: bool = False,
    aug: Optional[T.AugConfig] = None,
    use_siglip: bool = False,
    teacher: Optional[tuple] = None,
    coca_weights: Optional[Tuple[float, float]] = None,
):
    """``coca_weights=(caption_w, clip_w)`` selects the CoCaLoss branch for
    CoCa configs (reference factory.py:325-331); None = plain CLIP loss."""
    aug = aug or T.AugConfig()
    template_table = jnp.asarray(template_table)
    if teacher is not None:
        teacher = (teacher[0], jax.tree_util.tree_map(jnp.asarray, teacher[1]))

    def step_fn(state: TrainState, batch: Dict[str, jnp.ndarray], rng: jax.Array):
        mean, std = T.model_mean_std(cfg)
        if hp.augment:
            images = T.train_augment_normalize(
                batch["images"], rng, aug, mean=mean, std=std,
                boxes=batch.get("crop_boxes"), size=cfg.vision.image_size,
            )
        else:
            images = T.normalize_images(batch["images"], mean=mean, std=std)
        grad_fn = jax.value_and_grad(flyp_loss_fn, has_aux=True)
        (loss, metrics), grads = grad_fn(
            state.params, cfg, hp, batch, images, template_table, use_gt, use_siglip,
            teacher, coca_weights,
        )
        updates, opt_state = optimizer.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        params = dict(params, logit_scale=jnp.clip(params["logit_scale"], 0.0, LOG100))
        new_state = state.replace(step=state.step + 1, params=params, opt_state=opt_state)
        return new_state, metrics

    return step_fn
