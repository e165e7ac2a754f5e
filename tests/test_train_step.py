"""LatteCLIP train-step semantics + smoke training on synthetic data."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from latteclip_tpu.core.config import config_from_dict
from latteclip_tpu.models.clip import init_clip_params
from latteclip_tpu.models.tokenizer import get_tokenizer
from latteclip_tpu.train.objective import (
    clip_loss,
    cross_entropy_with_int_labels,
    text_confidence_weights,
)
from latteclip_tpu.train.optim import decay_mask, make_optimizer, make_schedule
from latteclip_tpu.train.state import build_template_table, create_train_state, init_memory_bank
from latteclip_tpu.train.step import (
    LOG100,
    LatteHParams,
    make_flyp_step,
    make_train_step,
    update_memory_bank,
)

TINY = config_from_dict(
    "tiny",
    {
        "embed_dim": 32,
        "vision_cfg": {"image_size": 32, "layers": 2, "width": 64, "patch_size": 16},
        "text_cfg": {"context_length": 77, "vocab_size": 49408, "width": 64, "heads": 4, "layers": 2},
    },
)
CLASSES = ["banded", "dotted", "striped", "zigzagged"]
TEMPLATES = [lambda c: f"{c} texture."]


def _batch(rng, B=8, C=4, size=32):
    return {
        "images": rng.integers(0, 255, size=(B, size, size, 3)).astype(np.uint8),
        "per_image_tokens": rng.integers(1, 40000, size=(B, 77)).astype(np.int32),
        "per_group_tokens": rng.integers(1, 40000, size=(B, 77)).astype(np.int32),
        "zs_preds": rng.integers(0, C, size=(B,)).astype(np.int32),
        "gt_labels": rng.integers(0, C, size=(B,)).astype(np.int32),
    }


@pytest.fixture(scope="module")
def setup():
    params = init_clip_params(jax.random.PRNGKey(0), TINY)
    tok = get_tokenizer()
    bank = init_memory_bank(params, TINY, tok, CLASSES, TEMPLATES)
    table = build_template_table(tok, CLASSES, TEMPLATES)
    sched = make_schedule("cosine", 1e-4, warmup=2, total_steps=20)
    opt = make_optimizer(sched)
    state = create_train_state(params, opt, bank)
    return params, tok, bank, table, opt, state


def test_cross_entropy_matches_torch():
    torch = pytest.importorskip("torch")
    rng = np.random.RandomState(0)
    logits = rng.randn(6, 9).astype(np.float32)
    labels = rng.randint(0, 9, 6)
    ours = float(cross_entropy_with_int_labels(jnp.asarray(logits), jnp.asarray(labels)))
    theirs = float(torch.nn.functional.cross_entropy(torch.tensor(logits), torch.tensor(labels)))
    assert abs(ours - theirs) < 1e-5


def test_clip_loss_symmetric_and_positive():
    rng = np.random.RandomState(0)
    img = rng.randn(8, 16).astype(np.float32)
    img /= np.linalg.norm(img, axis=1, keepdims=True)
    loss_random = float(clip_loss(jnp.asarray(img), jnp.asarray(rng.randn(8, 16).astype(np.float32)), 100.0))
    loss_aligned = float(clip_loss(jnp.asarray(img), jnp.asarray(img), 100.0))
    assert loss_aligned < loss_random  # aligned pairs are near-perfectly separable


def test_confidence_weights_margin():
    protos = jnp.asarray(np.eye(4, 8, dtype=np.float32))
    text = jnp.asarray(np.array([[1, 0, 0, 0, 0, 0, 0, 0], [0.6, 0.55, 0, 0, 0, 0, 0, 0]], np.float32))
    w = np.asarray(text_confidence_weights(text, protos))
    assert w[0] == pytest.approx(1.0)          # confident: margin 1-0
    assert w[1] == pytest.approx(0.05, abs=1e-6)  # ambiguous: small margin


def test_memory_bank_update_matches_dict_loop():
    """Segment-mean update == the reference's python dict loop (train.py:508-530)."""
    rng = np.random.RandomState(1)
    C, D, B = 4, 8, 16
    bank = rng.randn(C, D).astype(np.float32)
    bank /= np.linalg.norm(bank, axis=1, keepdims=True)
    preds = rng.randint(0, C, B)
    zs_preds = rng.randint(0, C, B)
    # leave class 3 unseen
    preds[preds == 3] = 0
    zs_preds[zs_preds == 3] = 1
    tf = rng.randn(B, D).astype(np.float32)
    tf_zs = rng.randn(B, D).astype(np.float32)

    ours = np.asarray(update_memory_bank(
        jnp.asarray(bank), jnp.asarray(preds), jnp.asarray(zs_preds),
        jnp.asarray(tf), jnp.asarray(tf_zs),
    ))

    # reference-style dict loop
    temp, cnt = {}, {}
    for i in range(B):
        for cls, feat in ((zs_preds[i], tf_zs[i]), (preds[i], tf[i])):
            temp[cls] = temp.get(cls, np.zeros(D, np.float32)) + feat
            cnt[cls] = cnt.get(cls, 0) + 1
    expected = bank.copy()
    for cls in temp:
        v = temp[cls] / cnt[cls]
        expected[cls] = v / np.linalg.norm(v)

    np.testing.assert_allclose(ours, expected, atol=1e-5)
    np.testing.assert_allclose(ours[3], bank[3])  # unseen class untouched


def test_decay_mask_names(setup):
    params, *_ = setup
    mask = decay_mask(params)
    assert mask["visual"]["blocks"]["in_proj_w"] is True
    assert mask["visual"]["blocks"]["ln_1_scale"] is False
    assert mask["visual"]["blocks"]["c_fc_b"] is False
    assert mask["text"]["token_embedding"] is True
    assert mask["text"]["pos_embed"] is True
    assert mask["visual"]["class_embedding"] is False
    assert mask["logit_scale"] is False


def test_decay_mask_resnet():
    """RN50 conv/attnpool weights must decay like the reference's ndim>=2
    rule (main.py:342); BN affine+stats and biases must not."""
    from latteclip_tpu.core.config import get_model_config

    cfg = get_model_config("RN50")
    params = init_clip_params(jax.random.PRNGKey(0), cfg)
    mask = decay_mask(params)
    v = mask["visual"]
    stem = v["stem"]
    assert stem["conv1_w"] is True and stem["conv2_w"] is True and stem["conv3_w"] is True
    assert stem["bn1_scale"] is False and stem["bn1_mean"] is False and stem["bn1_var"] is False
    first_block = v["stages"][0][0]
    assert first_block["conv1_w"] is True
    assert first_block["bn1_scale"] is False
    assert first_block["down_conv_w"] is True
    ap = v["attnpool"]
    assert ap["q_w"] is True and ap["k_w"] is True and ap["v_w"] is True and ap["c_w"] is True
    assert ap["q_b"] is False and ap["c_b"] is False
    assert ap["pos_embed"] is True


def test_schedule_matches_reference_formula():
    sched = make_schedule("cosine", base_lr=1.0, warmup=5, total_steps=25)
    # warmup: base*(step+1)/warmup
    assert float(sched(0)) == pytest.approx(1 / 5)
    assert float(sched(4)) == pytest.approx(1.0)
    # cosine after warmup
    e, es = 10 - 5, 25 - 5
    assert float(sched(10)) == pytest.approx(0.5 * (1 + np.cos(np.pi * e / es)))
    assert float(sched(25)) == pytest.approx(0.0, abs=1e-6)


def test_train_step_updates_and_clamps(setup):
    _params, _tok, bank, table, opt, state = setup
    hp = LatteHParams(augment=True)
    step = jax.jit(make_train_step(TINY, opt, hp, table))
    rng = np.random.default_rng(0)
    batch = _batch(rng)
    state1, metrics = step(state, batch, jax.random.PRNGKey(0))
    assert np.isfinite(float(metrics["loss"]))
    assert int(state1.step) == 1
    assert 0.0 <= float(state1.params["logit_scale"]) <= LOG100 + 1e-6
    # params changed, prototypes (epoch snapshot) did not, bank did
    assert not np.allclose(
        np.asarray(state1.params["text"]["text_projection"]),
        np.asarray(state.params["text"]["text_projection"]),
    )
    np.testing.assert_allclose(np.asarray(state1.prototypes), np.asarray(state.prototypes))
    assert not np.allclose(np.asarray(state1.memory_bank), np.asarray(state.memory_bank))
    # bank rows stay unit-norm
    norms = np.linalg.norm(np.asarray(state1.memory_bank), axis=1)
    np.testing.assert_allclose(norms, 1.0, atol=1e-5)


def test_smoke_training_reduces_loss(setup):
    """A few steps on a *fixed* batch must reduce the loss."""
    _params, _tok, _bank, table, _opt, _state = setup
    sched = make_schedule("const", 3e-4, warmup=1)
    opt = make_optimizer(sched)
    params = init_clip_params(jax.random.PRNGKey(1), TINY)
    tok = get_tokenizer()
    bank = init_memory_bank(params, TINY, tok, CLASSES, TEMPLATES)
    state = create_train_state(params, opt, bank)
    hp = LatteHParams(augment=False)  # deterministic input
    step = jax.jit(make_train_step(TINY, opt, hp, table))
    batch = _batch(np.random.default_rng(3), B=8)
    losses = []
    for i in range(6):
        state, metrics = step(state, batch, jax.random.PRNGKey(i))
        losses.append(float(metrics["loss"]))
    assert losses[-1] < losses[0], losses


def test_flyp_step_runs(setup):
    _params, _tok, _bank, table, opt, state = setup
    hp = LatteHParams(augment=False)
    step = jax.jit(make_flyp_step(TINY, opt, hp, table, use_gt=True))
    batch = _batch(np.random.default_rng(5))
    state1, metrics = step(state, batch, jax.random.PRNGKey(0))
    assert np.isfinite(float(metrics["loss"]))
    assert int(state1.step) == 1


def test_flyp_siglip_step_trains(setup):
    """--siglip end-to-end: the flyp step with the sigmoid loss runs and
    updates params (reference create_loss --siglip wiring,
    factory.py:337-341)."""
    params, tok, bank, table, opt, state = setup
    rng = np.random.default_rng(3)
    step = jax.jit(make_flyp_step(
        TINY, opt, LatteHParams(augment=False), table, use_siglip=True
    ))
    s1, m1 = step(state, _batch(rng), jax.random.PRNGKey(0))
    s2, m2 = step(s1, _batch(rng), jax.random.PRNGKey(1))
    assert np.isfinite(float(m1["loss"])) and np.isfinite(float(m2["loss"]))
    delta = max(
        float(jnp.max(jnp.abs(a.astype(jnp.float32) - b.astype(jnp.float32))))
        for a, b in zip(
            jax.tree_util.tree_leaves(state.params),
            jax.tree_util.tree_leaves(s2.params),
        )
    )
    assert delta > 0.0
    # sigmoid loss differs from InfoNCE on the same batch
    step_clip = jax.jit(make_flyp_step(
        TINY, opt, LatteHParams(augment=False), table, use_siglip=False
    ))
    rng2 = np.random.default_rng(3)
    b = _batch(rng2)
    _, mc = step_clip(state, b, jax.random.PRNGKey(0))
    rng3 = np.random.default_rng(3)
    _, ms = step(state, _batch(rng3), jax.random.PRNGKey(0))
    assert abs(float(mc["loss"]) - float(ms["loss"])) > 1e-4


# ---------------------------------------------------------------------------
# Reference inner-math oracle (VERDICT round 1, item 8): the fusion block of
# train_one_epoch_v2 (reference train.py:435-530) re-implemented in torch —
# including its two latent bugs — run on identical synthetic features against
# our fused-step math at bs==dim (both bug_compat modes) and bs!=dim.
# ---------------------------------------------------------------------------

def _torch_reference_fusion(image_f, label_f, label_zs_f, per_img_f, per_grp_f,
                            bank, prototypes, preds, zs_preds, alpha, scale):
    """Line-for-line torch port of reference train.py:442-504 from the point
    where features exist (towers are oracle-tested elsewhere)."""
    import torch
    import torch.nn.functional as F

    def weights(tf):  # compute_text_weights, train.py:292-303 (preds unused)
        w = tf @ prototypes.T
        top2 = torch.topk(w, 2, dim=1).values
        return (top2[:, 0] - top2[:, 1]).detach() + 1e-6

    w_img, w_grp = weights(per_img_f), weights(per_grp_f)
    w_label, w_label_zs = weights(label_f), weights(label_zs_f)

    total = w_label + w_img + w_grp
    total_zs = w_label_zs + w_img + w_grp
    # train.py:474-478: label stream WITHOUT unsqueeze(1) (latent bug a)
    text_features = (w_label * label_f
                     + per_img_f * w_img.unsqueeze(1)
                     + per_grp_f * w_grp.unsqueeze(1)) / total.unsqueeze(1)
    # train.py:480-483: zs numerator reuses w_label (latent bug b)
    text_features_zs = (w_label * label_zs_f
                        + per_img_f * w_img.unsqueeze(1)
                        + per_grp_f * w_grp.unsqueeze(1)) / total_zs.unsqueeze(1)

    anchor, anchor_zs = bank[preds], bank[zs_preds]
    text_final = anchor + alpha * (text_features - anchor)
    text_final_zs = anchor_zs + alpha * (text_features_zs - anchor_zs)

    def clip_loss_t(img, txt):  # ClipLoss, reference loss.py:89-130
        logits = scale * img @ txt.T
        labels = torch.arange(img.shape[0])
        return 0.5 * (F.cross_entropy(logits, labels)
                      + F.cross_entropy(logits.T, labels))

    total_loss = clip_loss_t(image_f, text_final) + clip_loss_t(image_f, text_final_zs)
    return total_loss, text_final, text_final_zs


def _fusion_features(rng, B, E, C=7):
    def unit(shape):
        x = rng.standard_normal(shape).astype(np.float32)
        return x / np.linalg.norm(x, axis=-1, keepdims=True)
    return {
        "image_f": unit((B, E)), "label_f": unit((B, E)), "label_zs_f": unit((B, E)),
        "per_img_f": unit((B, E)), "per_grp_f": unit((B, E)),
        "bank": unit((C, E)), "prototypes": unit((C, E)),
        "preds": rng.integers(0, C, size=(B,)), "zs_preds": rng.integers(0, C, size=(B,)),
    }


def _ours_fusion(f, alpha, scale, bug_compat):
    from latteclip_tpu.train.step import fuse_text_streams

    w_img = text_confidence_weights(jnp.asarray(f["per_img_f"]), jnp.asarray(f["prototypes"])) + 1e-6
    w_grp = text_confidence_weights(jnp.asarray(f["per_grp_f"]), jnp.asarray(f["prototypes"])) + 1e-6
    w_label = text_confidence_weights(jnp.asarray(f["label_f"]), jnp.asarray(f["prototypes"])) + 1e-6
    w_label_zs = text_confidence_weights(jnp.asarray(f["label_zs_f"]), jnp.asarray(f["prototypes"])) + 1e-6
    fused, fused_zs = fuse_text_streams(
        jnp.asarray(f["label_f"]), jnp.asarray(f["label_zs_f"]),
        jnp.asarray(f["per_img_f"]), jnp.asarray(f["per_grp_f"]),
        w_label, w_label_zs, w_img, w_grp, bug_compat,
    )
    anchor = jnp.asarray(f["bank"])[f["preds"]]
    anchor_zs = jnp.asarray(f["bank"])[f["zs_preds"]]
    text_final = anchor + alpha * (fused - anchor)
    text_final_zs = anchor_zs + alpha * (fused_zs - anchor_zs)
    loss = (clip_loss(jnp.asarray(f["image_f"]), text_final, scale)
            + clip_loss(jnp.asarray(f["image_f"]), text_final_zs, scale))
    return loss, text_final, text_final_zs


def test_fusion_oracle_bug_compat_matches_reference_at_bs_eq_dim():
    torch = pytest.importorskip("torch")
    B = E = 32  # the regime where the reference's broadcast silently "works"
    f = _fusion_features(np.random.default_rng(11), B, E)
    alpha, scale = 0.01, 100.0
    tt = {k: torch.from_numpy(np.asarray(v)) for k, v in f.items()}
    ref_loss, ref_tf, ref_tfzs = _torch_reference_fusion(
        tt["image_f"], tt["label_f"], tt["label_zs_f"], tt["per_img_f"],
        tt["per_grp_f"], tt["bank"], tt["prototypes"], tt["preds"],
        tt["zs_preds"], alpha, scale,
    )
    loss, tf, tfzs = _ours_fusion(f, alpha, scale, bug_compat=True)
    np.testing.assert_allclose(np.asarray(tf), ref_tf.numpy(), atol=2e-6)
    np.testing.assert_allclose(np.asarray(tfzs), ref_tfzs.numpy(), atol=2e-6)
    np.testing.assert_allclose(float(loss), float(ref_loss), atol=1e-5)

    # the intended math deliberately DIFFERS from the reference here
    loss_fixed, tf_fixed, _ = _ours_fusion(f, alpha, scale, bug_compat=False)
    assert float(jnp.max(jnp.abs(tf_fixed - jnp.asarray(ref_tf.numpy())))) > 1e-4


def test_fusion_oracle_intended_math_at_bs_ne_dim():
    """At bs != dim the reference would crash (shape mismatch); our intended
    math runs, and bug_compat correctly refuses."""
    torch = pytest.importorskip("torch")
    B, E = 48, 32
    f = _fusion_features(np.random.default_rng(12), B, E)
    alpha, scale = 0.01, 100.0

    # torch oracle for the INTENDED math: every weight per-sample, each
    # branch self-consistent
    tt = {k: torch.from_numpy(np.asarray(v)) for k, v in f.items()}
    def weights(tf):
        top2 = torch.topk(tf @ tt["prototypes"].T, 2, dim=1).values
        return (top2[:, 0] - top2[:, 1]) + 1e-6
    w_img, w_grp = weights(tt["per_img_f"]), weights(tt["per_grp_f"])
    w_label, w_label_zs = weights(tt["label_f"]), weights(tt["label_zs_f"])
    tf_ref = (w_label.unsqueeze(1) * tt["label_f"]
              + w_img.unsqueeze(1) * tt["per_img_f"]
              + w_grp.unsqueeze(1) * tt["per_grp_f"]) / (w_label + w_img + w_grp).unsqueeze(1)
    tfzs_ref = (w_label_zs.unsqueeze(1) * tt["label_zs_f"]
                + w_img.unsqueeze(1) * tt["per_img_f"]
                + w_grp.unsqueeze(1) * tt["per_grp_f"]) / (w_label_zs + w_img + w_grp).unsqueeze(1)

    _, tf, tfzs = _ours_fusion(f, alpha, scale, bug_compat=False)
    anchor = tt["bank"][f["preds"]]
    anchor_zs = tt["bank"][f["zs_preds"]]
    np.testing.assert_allclose(
        np.asarray(tf), (anchor + alpha * (tf_ref - anchor)).numpy(), atol=2e-6)
    np.testing.assert_allclose(
        np.asarray(tfzs), (anchor_zs + alpha * (tfzs_ref - anchor_zs)).numpy(), atol=2e-6)

    with pytest.raises(ValueError, match="batch == embed_dim"):
        _ours_fusion(f, alpha, scale, bug_compat=True)


def test_bug_compat_step_end_to_end(setup):
    """A full train step with --fusion-bug-compat at batch == embed_dim runs
    and differs from the default step."""
    _params, _tok, _bank, table, opt, state = setup
    B = TINY.embed_dim  # 32
    batch = _batch(np.random.default_rng(7), B=B)
    step_bug = jax.jit(make_train_step(
        TINY, opt, LatteHParams(augment=False, bug_compat=True), table))
    step_fix = jax.jit(make_train_step(
        TINY, opt, LatteHParams(augment=False, bug_compat=False), table))
    _, mb = step_bug(state, batch, jax.random.PRNGKey(0))
    _, mf = step_fix(state, batch, jax.random.PRNGKey(0))
    assert np.isfinite(float(mb["loss"])) and np.isfinite(float(mf["loss"]))
    assert abs(float(mb["loss"]) - float(mf["loss"])) > 1e-7


def test_fused_text_forward_matches_separate():
    """fuse_text_fwd=True (one [C+2B,77] encode) is value-identical to the
    two-call form — same weights, same rows, padding rows discarded.
    Checked in f32 (bf16 rounds differently across GEMM batchings)."""
    cfg = config_from_dict("tiny-f32", {
        "embed_dim": 32, "compute_dtype": "float32",
        "vision_cfg": {"image_size": 32, "layers": 2, "width": 64, "patch_size": 16},
        "text_cfg": {"context_length": 77, "vocab_size": 49408, "width": 64,
                     "heads": 4, "layers": 2},
    })
    params = init_clip_params(jax.random.PRNGKey(0), cfg)
    tok = get_tokenizer()
    bank = init_memory_bank(params, cfg, tok, CLASSES, TEMPLATES)
    table = build_template_table(tok, CLASSES, TEMPLATES)
    opt = make_optimizer(make_schedule("const", 1e-4, warmup=1))
    state = create_train_state(params, opt, bank)
    step_a = jax.jit(make_train_step(cfg, opt, LatteHParams(augment=False), table))
    step_b = jax.jit(make_train_step(
        cfg, opt, LatteHParams(augment=False, fuse_text_fwd=True), table))
    for B in (6, 7):  # C+2B = 16 (pad 0) and 18 (pad 6)
        batch = _batch(np.random.default_rng(9), B=B)
        sa, ma = step_a(state, batch, jax.random.PRNGKey(0))
        sb, mb = step_b(state, batch, jax.random.PRNGKey(0))
        assert abs(float(ma["loss"]) - float(mb["loss"])) < 1e-5, B
        np.testing.assert_allclose(
            np.asarray(sa.memory_bank), np.asarray(sb.memory_bank), atol=1e-5)
        np.testing.assert_allclose(
            np.asarray(sa.params["text"]["text_projection"]),
            np.asarray(sb.params["text"]["text_projection"]), rtol=0, atol=1e-5)


def test_per_tower_remat_overrides_equivalent(setup):
    """remat / remat_text / remat_vision overrides change scheduling only.

    jax.checkpoint recomputes the same math, so any combination of per-tower
    remat flags must leave the step's loss, bank, and params unchanged
    (the bench's remat_vision=False lever relies on this).
    """
    params, tok, bank, table, opt, state = setup
    batch = _batch(np.random.default_rng(11))
    base = jax.jit(make_train_step(TINY, opt, LatteHParams(augment=False, remat=True), table))
    s0, m0 = base(state, batch, jax.random.PRNGKey(0))
    for hp in (
        LatteHParams(augment=False, remat=True, remat_vision=False),
        LatteHParams(augment=False, remat=True, remat_text=False),
        LatteHParams(augment=False, remat=False, remat_vision=True),
    ):
        step = jax.jit(make_train_step(TINY, opt, hp, table))
        s1, m1 = step(state, batch, jax.random.PRNGKey(0))
        assert abs(float(m0["loss"]) - float(m1["loss"])) < 1e-5, hp
        np.testing.assert_allclose(
            np.asarray(s0.memory_bank), np.asarray(s1.memory_bank), atol=1e-5)
        np.testing.assert_allclose(
            np.asarray(s0.params["visual"]["proj"]),
            np.asarray(s1.params["visual"]["proj"]), rtol=0, atol=1e-5)
