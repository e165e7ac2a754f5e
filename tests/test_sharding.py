"""Multi-device (8 virtual CPU) data-parallel training tests."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from latteclip_tpu.core.config import config_from_dict
from latteclip_tpu.core.mesh import (
    make_mesh,
    make_sharded_train_step,
    replicate,
    shard_batch,
)
from latteclip_tpu.models.clip import init_clip_params
from latteclip_tpu.models.tokenizer import get_tokenizer
from latteclip_tpu.train.optim import make_optimizer, make_schedule
from latteclip_tpu.train.state import build_template_table, create_train_state, init_memory_bank
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


def _make_state_and_step(mesh=None):
    params = init_clip_params(jax.random.PRNGKey(0), TINY)
    tok = get_tokenizer()
    bank = init_memory_bank(params, TINY, tok, CLASSES, TEMPLATES)
    table = build_template_table(tok, CLASSES, TEMPLATES)
    opt = make_optimizer(make_schedule("const", 1e-4, warmup=1))
    state = create_train_state(params, opt, bank)
    hp = LatteHParams(augment=False)
    step = make_train_step(TINY, opt, hp, table)
    return state, step


def _batch(B=16):
    rng = np.random.default_rng(0)
    return {
        "images": rng.integers(0, 255, size=(B, 32, 32, 3)).astype(np.uint8),
        "per_image_tokens": rng.integers(1, 40000, size=(B, 77)).astype(np.int32),
        "per_group_tokens": rng.integers(1, 40000, size=(B, 77)).astype(np.int32),
        "zs_preds": rng.integers(0, 4, size=(B,)).astype(np.int32),
        "gt_labels": rng.integers(0, 4, size=(B,)).astype(np.int32),
    }


def test_mesh_has_8_devices():
    mesh = make_mesh()
    assert mesh.devices.size == 8
    assert mesh.axis_names == ("data", "model")


def test_sharded_step_matches_single_device():
    batch = _batch()

    # single device
    state, step = _make_state_and_step()
    s1, m1 = jax.jit(step)(state, batch, jax.random.PRNGKey(0))

    # 8-device mesh, same inputs
    mesh = make_mesh()
    state2, step2 = _make_state_and_step()
    sharded_step = make_sharded_train_step(step2, mesh)
    s2, m2 = sharded_step(replicate(state2, mesh), shard_batch(batch, mesh), jax.random.PRNGKey(0))

    assert abs(float(m1["loss"]) - float(m2["loss"])) < 1e-3
    np.testing.assert_allclose(
        np.asarray(s1.memory_bank), np.asarray(s2.memory_bank), atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(s1.params["logit_scale"]), np.asarray(s2.params["logit_scale"]), atol=1e-5
    )


def test_sharded_bank_is_replicated_and_synced():
    """Every device must hold the identical updated bank (fixes the
    reference's unsynchronized per-rank bank, SURVEY §2.4)."""
    mesh = make_mesh()
    state, step = _make_state_and_step()
    sharded_step = make_sharded_train_step(step, mesh)
    s, _ = sharded_step(replicate(state, mesh), shard_batch(_batch(), mesh), jax.random.PRNGKey(0))
    bank_shards = [np.asarray(sh.data) for sh in s.memory_bank.addressable_shards]
    assert len(bank_shards) == 8
    for shard in bank_shards[1:]:
        np.testing.assert_array_equal(bank_shards[0], shard)


def test_model_axis_mesh_shapes():
    mesh = make_mesh(model_parallelism=2)
    assert mesh.devices.shape == (4, 2)
