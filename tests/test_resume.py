"""Checkpoint/resume parity: optimizer state round-trips through .pt files.

The reference saves ``{"epoch", "name", "state_dict", "optimizer"}`` and
restores the optimizer on resume (reference ``src/training/main.py:519-540,
374-385``). These tests assert the TPU rebuild's equivalent: train → save →
resume → train matches uninterrupted training bitwise on params, opt_state,
and the memory bank — i.e. resume does not silently reset AdamW moments or
replay the warmup schedule.
"""
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from latteclip_tpu.core import checkpoint as ckpt
from latteclip_tpu.core.config import config_from_dict
from latteclip_tpu.models.clip import init_clip_params
from latteclip_tpu.models.tokenizer import get_tokenizer
from latteclip_tpu.train.optim import make_optimizer, make_schedule
from latteclip_tpu.train.state import (
    build_template_table,
    create_train_state,
    init_memory_bank,
)
from latteclip_tpu.train.step import LatteHParams, make_train_step

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


def _fresh_state():
    params = init_clip_params(jax.random.PRNGKey(0), TINY)
    tok = get_tokenizer()
    bank = init_memory_bank(params, TINY, tok, CLASSES, TEMPLATES)
    table = build_template_table(tok, CLASSES, TEMPLATES)
    # short warmup so the schedule position is visible in the update
    opt = make_optimizer(make_schedule("cosine", 1e-2, warmup=3, total_steps=10))
    state = create_train_state(params, opt, bank)
    return state, opt, table


def _batch(seed, B=8):
    rng = np.random.default_rng(seed)
    return {
        "images": rng.integers(0, 255, size=(B, 32, 32, 3)).astype(np.uint8),
        "per_image_tokens": rng.integers(1, 40000, size=(B, 77)).astype(np.int32),
        "per_group_tokens": rng.integers(1, 40000, size=(B, 77)).astype(np.int32),
        "zs_preds": rng.integers(0, 4, size=(B,)).astype(np.int32),
        "gt_labels": rng.integers(0, 4, size=(B,)).astype(np.int32),
    }


def _assert_trees_equal(a, b, what):
    la = jax.tree_util.tree_flatten_with_path(a)[0]
    lb = jax.tree_util.tree_leaves(b)
    assert len(la) == len(lb)
    for (path, x), y in zip(la, lb):
        np.testing.assert_array_equal(
            np.asarray(x), np.asarray(y),
            err_msg=f"{what} leaf {jax.tree_util.keystr(path)} diverged",
        )


def test_opt_state_flatten_restore_roundtrip():
    state, opt, _ = _fresh_state()
    flat = ckpt.flatten_opt_state(state.opt_state)
    assert flat, "flattened optimizer state is empty"
    restored = ckpt.restore_opt_state(state.opt_state, flat)
    _assert_trees_equal(state.opt_state, restored, "opt_state")

    with pytest.raises(KeyError):
        ckpt.restore_opt_state(state.opt_state, {})


def test_resume_matches_uninterrupted_training(tmp_path):
    state, opt, table = _fresh_state()
    step = jax.jit(make_train_step(TINY, opt, LatteHParams(augment=False), table))

    # --- uninterrupted: 4 steps ---
    s = state
    for i in range(4):
        s, _ = step(s, _batch(i), jax.random.PRNGKey(i))
    straight = s

    # --- interrupted: 2 steps, save, resume, 2 more steps ---
    s = state
    for i in range(2):
        s, _ = step(s, _batch(i), jax.random.PRNGKey(i))

    path = os.path.join(tmp_path, "epoch_1.pt")
    ckpt.save_clip_pt(
        path, s.params, TINY,
        epoch=1, name="resume-test",
        memory_bank=np.asarray(s.memory_bank), classnames=CLASSES,
        opt_state=s.opt_state, step=int(s.step),
    )

    r_params, r_bank, r_meta = ckpt.load_clip_pt(path, TINY)
    assert r_meta["epoch"] == 1
    assert r_meta["step"] == 2
    assert "optimizer" in r_meta

    bank_arr = np.stack([r_bank[c] for c in CLASSES])
    resumed = create_train_state(r_params, opt, bank_arr)
    resumed = resumed.replace(
        step=jnp.asarray(r_meta["step"], jnp.int32),
        opt_state=ckpt.restore_opt_state(resumed.opt_state, r_meta["optimizer"]),
        prototypes=state.prototypes,  # epoch snapshot, unchanged in-epoch
    )
    for i in range(2, 4):
        resumed, _ = step(resumed, _batch(i), jax.random.PRNGKey(i))

    # float32 .pt round-trip of f32 params/moments is exact: bitwise equality
    _assert_trees_equal(straight.params, resumed.params, "params")
    _assert_trees_equal(straight.opt_state, resumed.opt_state, "opt_state")
    np.testing.assert_array_equal(
        np.asarray(straight.memory_bank), np.asarray(resumed.memory_bank)
    )
    assert int(straight.step) == int(resumed.step) == 4


def test_resume_without_optimizer_state_differs():
    """Sanity: dropping the optimizer state DOES change the trajectory —
    the round-trip test above isn't vacuously passing."""
    state, opt, table = _fresh_state()
    step = jax.jit(make_train_step(TINY, opt, LatteHParams(augment=False), table))

    s = state
    for i in range(4):
        s, _ = step(s, _batch(i), jax.random.PRNGKey(i))
    straight = s

    s = state
    for i in range(2):
        s, _ = step(s, _batch(i), jax.random.PRNGKey(i))
    # "resume" that re-inits optimizer state (the round-1 behavior)
    reset = create_train_state(s.params, opt, np.asarray(s.memory_bank))
    reset = reset.replace(prototypes=state.prototypes)
    for i in range(2, 4):
        reset, _ = step(reset, _batch(i), jax.random.PRNGKey(i))

    diffs = [
        float(jnp.max(jnp.abs(a.astype(jnp.float32) - b.astype(jnp.float32))))
        for a, b in zip(
            jax.tree_util.tree_leaves(straight.params),
            jax.tree_util.tree_leaves(reset.params),
        )
    ]
    assert max(diffs) > 0.0, "optimizer reset should alter the trajectory"


def test_resume_tolerates_injected_logit_bias():
    """Resuming --siglip from a plain-CLIP checkpoint: the injected
    logit_bias has no saved moments; restore keeps fresh zeros for it and
    restores everything else (review finding: this previously KeyError'd)."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    from latteclip_tpu.core.checkpoint import flatten_opt_state, restore_opt_state

    params = {"w": jnp.ones((4, 4)), "logit_scale": jnp.ones(())}
    opt = optax.adamw(optax.constant_schedule(1e-3))
    state = opt.init(params)
    saved = flatten_opt_state(state)

    # template built AFTER injecting logit_bias
    params2 = dict(params, logit_bias=jnp.asarray(-10.0))
    template = opt.init(params2)
    restored = restore_opt_state(template, saved)
    flat = {k: v for k, v in flatten_opt_state(restored).items()}
    for k, v in flat.items():
        if "logit_bias" in k:
            assert np.asarray(v).sum() == 0 or np.asarray(v).ndim == 0
    # a genuinely missing leaf still errors
    import pytest as _pytest

    bad = {k: v for k, v in saved.items() if "w" not in k}
    with _pytest.raises(KeyError):
        restore_opt_state(opt.init(params), bad)
