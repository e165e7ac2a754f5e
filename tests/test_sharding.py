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


def test_tensor_parallel_step_matches_single_device():
    """4×2 data×model mesh: Megatron-sharded MLP kernels (c_fc column-split,
    c_proj row-split) must reproduce the single-device trajectory, and the
    MLP leaves must actually be distributed (not replicated)."""
    from latteclip_tpu.core.mesh import shard_train_state, train_state_shardings

    batch = _batch()
    state, step = _make_state_and_step()
    s1, m1 = jax.jit(step)(state, batch, jax.random.PRNGKey(0))

    mesh = make_mesh(model_parallelism=2)
    state2, step2 = _make_state_and_step()
    shardings = train_state_shardings(state2, mesh)
    spec = shardings.params["text"]["blocks"]["c_fc_w"].spec
    assert spec == jax.sharding.PartitionSpec(None, None, "model")
    # optimizer moments follow the same spec as their params
    flat = jax.tree_util.tree_leaves_with_path(shardings.opt_state)
    fc_specs = [s.spec for p, s in flat if "c_fc_w" in jax.tree_util.keystr(p)]
    assert fc_specs and all(s == spec for s in fc_specs)

    sharded_step = make_sharded_train_step(step2, mesh, state2)
    placed = shard_train_state(state2, mesh)
    fc = placed.params["text"]["blocks"]["c_fc_w"]
    # each device holds a distinct hidden-dim half, 4x batch-group replication
    assert fc.addressable_shards[0].data.shape[-1] == fc.shape[-1] // 2
    s2, m2 = sharded_step(placed, shard_batch(batch, mesh), jax.random.PRNGKey(0))

    # bf16 compute + split-contraction psum reorders reductions: tolerances
    # are a few bf16 ulps wider than the pure-DP equivalence above
    assert abs(float(m1["loss"]) - float(m2["loss"])) < 5e-3
    np.testing.assert_allclose(
        np.asarray(s1.memory_bank), np.asarray(s2.memory_bank), atol=1e-3
    )
    c1 = np.asarray(s1.params["visual"]["blocks"]["c_proj_w"])
    c2 = np.asarray(s2.params["visual"]["blocks"]["c_proj_w"])
    # one AdamW step moves each weight by <= ~lr (1e-4); bf16 grad noise on
    # near-zero grads can flip an update's sign, so bound by 2 lr absolute
    np.testing.assert_allclose(c1, c2, rtol=0, atol=2e-4)


def test_model_parallel_without_state_is_rejected():
    mesh = make_mesh(model_parallelism=2)
    state, step = _make_state_and_step()
    with pytest.raises(ValueError, match="model_parallelism"):
        make_sharded_train_step(step, mesh)


def test_gather_replicated_roundtrips_tp_shards():
    """core.mesh.gather_replicated: TP-sharded params all-gather back to
    fully replicated arrays equal to the originals — the host-fetch path
    multi-host eval/checkpointing relies on (loop._host_local_eval_state)."""
    from latteclip_tpu.core.mesh import (
        gather_replicated,
        shard_train_state,
        tree_fully_replicated,
    )

    state, _ = _make_state_and_step()
    mesh = make_mesh(model_parallelism=2)
    placed = shard_train_state(state, mesh)
    assert not tree_fully_replicated(placed.params)  # c_fc/c_proj are TP-split

    gathered = gather_replicated(placed.params, mesh)
    assert tree_fully_replicated(gathered)
    for (pa, a), (pb, b) in zip(
        jax.tree_util.tree_leaves_with_path(state.params),
        jax.tree_util.tree_leaves_with_path(gathered),
    ):
        assert jax.tree_util.keystr(pa) == jax.tree_util.keystr(pb)
        np.testing.assert_array_equal(
            np.asarray(a), np.asarray(b), err_msg=jax.tree_util.keystr(pa))
