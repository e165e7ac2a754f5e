"""--distill-model wiring: frozen-teacher soft targets in the FLYP step
(reference main.py:213-219,265-272 -> DistillClipLoss loss.py:324-362)."""
import numpy as np
import jax
import jax.numpy as jnp

from latteclip_tpu.core.config import config_from_dict
from latteclip_tpu.models.clip import init_clip_params
from latteclip_tpu.models.tokenizer import get_tokenizer
from latteclip_tpu.train.optim import make_optimizer, make_schedule
from latteclip_tpu.train.state import build_template_table, create_train_state, init_memory_bank
from latteclip_tpu.train.step import LatteHParams, make_flyp_step

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


def _batch(rng, B=8):
    return {
        "images": jnp.asarray(rng.integers(0, 255, size=(B, 32, 32, 3)).astype(np.uint8)),
        "zs_preds": jnp.asarray(rng.integers(0, 4, size=(B,)).astype(np.int32)),
        "gt_labels": jnp.asarray(rng.integers(0, 4, size=(B,)).astype(np.int32)),
    }


def test_distill_step_trains_student_only():
    params = init_clip_params(jax.random.PRNGKey(0), TINY)
    teacher_params = init_clip_params(jax.random.PRNGKey(7), TINY)
    tok = get_tokenizer()
    bank = init_memory_bank(params, TINY, tok, CLASSES, TEMPLATES)
    table = build_template_table(tok, CLASSES, TEMPLATES)
    opt = make_optimizer(make_schedule("cosine", 1e-3, warmup=1, total_steps=10))
    state = create_train_state(params, opt, bank)

    plain = jax.jit(make_flyp_step(TINY, opt, LatteHParams(augment=False), table))
    distill = jax.jit(make_flyp_step(
        TINY, opt, LatteHParams(augment=False), table,
        teacher=(TINY, teacher_params),
    ))

    batch = _batch(np.random.default_rng(0))
    rng = jax.random.PRNGKey(0)
    _, m_plain = plain(state, batch, rng)
    s1, m_dist = distill(state, batch, rng)

    # teacher terms present, additive, and change the total loss
    assert "distill_loss" in m_dist and float(m_dist["distill_loss"]) > 0.0
    assert float(m_dist["loss"]) != float(m_plain["loss"])
    np.testing.assert_allclose(
        float(m_dist["loss"]),
        float(m_dist["contrastive_loss"]) + float(m_dist["distill_loss"]),
        rtol=1e-6,
    )

    # student params actually moved
    moved = jax.tree_util.tree_reduce(
        lambda a, b: a + b,
        jax.tree_util.tree_map(
            lambda a, b: float(jnp.abs(a - b).sum()), s1.params, state.params
        ),
    )
    assert moved > 0.0

    # distilling against an identical teacher is self-consistent: loss is the
    # entropy of the teacher distribution, minimised when student == teacher
    self_distill = jax.jit(make_flyp_step(
        TINY, opt, LatteHParams(augment=False), table, teacher=(TINY, params)
    ))
    _, m_self = self_distill(state, batch, rng)
    assert float(m_self["distill_loss"]) < float(m_dist["distill_loss"])
