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
