"""Tower locking (LiT) + BN-buffer freezing.

Reference: ``--lock-image/--lock-text`` with ``unlocked_groups``
(``src/training/main.py:294-305``, ``src/open_clip/transformer.py:435-466``)
and torch's BN running stats being buffers (never optimized).
"""
import numpy as np

import jax
import jax.numpy as jnp

from latteclip_tpu.core.config import config_from_dict, get_model_config
from latteclip_tpu.models.clip import init_clip_params
from latteclip_tpu.train.optim import make_optimizer, make_schedule

TINY = config_from_dict(
    "tiny",
    {
        "embed_dim": 32,
        "vision_cfg": {"image_size": 32, "layers": 3, "width": 64, "patch_size": 16},
        "text_cfg": {"context_length": 77, "vocab_size": 49408, "width": 64, "heads": 4, "layers": 2},
    },
)


def _apply_one_update(params, opt):
    import optax

    opt_state = opt.init(params)
    grads = jax.tree_util.tree_map(lambda x: jnp.ones_like(x), params)
    updates, _ = opt.update(grads, opt_state, params)
    return optax.apply_updates(params, updates)


def _max_change(a, b):
    return max(
        float(jnp.max(jnp.abs(x.astype(jnp.float32) - y.astype(jnp.float32))))
        for x, y in zip(jax.tree_util.tree_leaves(a), jax.tree_util.tree_leaves(b))
    )


def test_lock_image_freezes_visual_tower():
    params = init_clip_params(jax.random.PRNGKey(0), TINY)
    opt = make_optimizer(make_schedule("const", 1e-2, warmup=1), lock_image=True)
    new = _apply_one_update(params, opt)
    assert _max_change(params["visual"], new["visual"]) == 0.0
    assert _max_change(params["text"], new["text"]) > 0.0


def test_lock_text_freezes_text_tower():
    params = init_clip_params(jax.random.PRNGKey(0), TINY)
    opt = make_optimizer(make_schedule("const", 1e-2, warmup=1), lock_text=True)
    new = _apply_one_update(params, opt)
    assert _max_change(params["text"], new["text"]) == 0.0
    assert _max_change(params["visual"], new["visual"]) > 0.0


def test_unlocked_groups_reference_semantics():
    """unlocked_groups=2 on a 3-block tower: post/proj + last block train;
    blocks 0-1 and the embedding group stay frozen."""
    params = init_clip_params(jax.random.PRNGKey(0), TINY)
    opt = make_optimizer(
        make_schedule("const", 1e-2, warmup=1),
        lock_image=True, lock_image_unlocked_groups=2,
    )
    new = _apply_one_update(params, opt)

    v0, v1 = params["visual"], new["visual"]
    blk_delta = np.abs(
        np.asarray(v1["blocks"]["c_fc_w"]) - np.asarray(v0["blocks"]["c_fc_w"])
    ).reshape(3, -1).max(axis=1)
    assert blk_delta[0] == 0.0 and blk_delta[1] == 0.0, "early blocks must freeze"
    assert blk_delta[2] > 0.0, "last block must train"
    assert np.array_equal(np.asarray(v0["patch_kernel"]), np.asarray(v1["patch_kernel"]))
    assert np.array_equal(np.asarray(v0["pos_embed"]), np.asarray(v1["pos_embed"]))
    assert _max_change(v0["proj"], v1["proj"]) > 0.0, "proj group must train"
    assert _max_change(v0["ln_post_scale"], v1["ln_post_scale"]) > 0.0
    # text tower unaffected
    assert _max_change(params["text"], new["text"]) > 0.0


def test_bn_running_stats_never_updated():
    cfg = get_model_config("RN50")
    params = init_clip_params(jax.random.PRNGKey(0), cfg)
    opt = make_optimizer(make_schedule("const", 1e-2, warmup=1))
    new = _apply_one_update(params, opt)
    stem0, stem1 = params["visual"]["stem"], new["visual"]["stem"]
    assert np.array_equal(np.asarray(stem0["bn1_mean"]), np.asarray(stem1["bn1_mean"]))
    assert np.array_equal(np.asarray(stem0["bn1_var"]), np.asarray(stem1["bn1_var"]))
    # trainable BN affine + conv weights do move
    assert _max_change(stem0["conv1_w"], stem1["conv1_w"]) > 0.0
    assert _max_change(stem0["bn1_scale"], stem1["bn1_scale"]) > 0.0


def test_unlocked_groups_one_is_proj_only():
    """Reference lock() group semantics (transformer.py:435-466): n=1
    unlocks ONLY the projection; ln_post belongs to the last block's group
    (n>=2). Regression for a review finding."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from latteclip_tpu.train.optim import mask_tower_updates

    L, D = 3, 8
    updates = {
        "visual": {
            "patch_kernel": jnp.ones((4, D)),
            "pos_embed": jnp.ones((5, D)),
            "ln_pre_scale": jnp.ones((D,)),
            "ln_pre_bias": jnp.ones((D,)),
            "blocks": {"w": jnp.ones((L, D))},
            "ln_post_scale": jnp.ones((D,)),
            "ln_post_bias": jnp.ones((D,)),
            "proj": jnp.ones((D, D)),
        },
        "logit_scale": jnp.ones(()),
    }
    tx1 = mask_tower_updates("visual", 1)
    out1, _ = tx1.update(updates, tx1.init(updates))
    v1 = out1["visual"]
    assert np.asarray(v1["proj"]).sum() > 0            # proj trains
    assert np.asarray(v1["ln_post_scale"]).sum() == 0  # ln_post frozen at n=1
    assert np.asarray(v1["blocks"]["w"]).sum() == 0    # no blocks at n=1
    assert np.asarray(v1["patch_kernel"]).sum() == 0

    tx2 = mask_tower_updates("visual", 2)
    out2, _ = tx2.update(updates, tx2.init(updates))
    v2 = out2["visual"]
    assert np.asarray(v2["ln_post_scale"]).sum() > 0   # with the last block
    np.testing.assert_array_equal(np.asarray(v2["blocks"]["w"])[-1], np.ones(D))
    assert np.asarray(v2["blocks"]["w"])[:-1].sum() == 0

    # ResNet-style towers (no 'blocks'): clear error instead of KeyError
    import pytest as _pytest

    rn_updates = {"visual": {"stem": {"w": jnp.ones((2, 2))}}}
    tx = mask_tower_updates("visual", 1)
    with _pytest.raises(ValueError, match="no 'blocks' stack"):
        tx.update(rn_updates, tx.init(rn_updates))
