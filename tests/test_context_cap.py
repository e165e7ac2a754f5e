"""--text-context-cap: shorter static text context with exact semantics.

Positions past a sequence's EOT are invisible to CLIP text features
(causal mask + EOT pooling), so truncating the pre-tokenized caption /
template tables to the dataset's max EOT changes compute, not results.
These tests pin (1) the feature-exactness claim on the tower itself,
(2) the cap/truncate helper semantics, and (3) the end-to-end pipeline +
train-step flow at a capped context.
"""
import os

import numpy as np
import pytest

import jax
import optax

from latteclip_tpu.core.config import config_from_dict
from latteclip_tpu.data.pipeline import (
    PipelineConfig,
    TrainPipeline,
    _truncate_tokens,
    apply_context_cap,
    build_train_data,
)
from latteclip_tpu.data.synthetic import DEFAULT_CLASSES, make_full_fixture
from latteclip_tpu.models import clip as clip_mod
from latteclip_tpu.models.clip import init_clip_params
from latteclip_tpu.models.tokenizer import get_tokenizer

TINY = config_from_dict(
    "tiny-cap",
    {
        "embed_dim": 16,
        "compute_dtype": "float32",
        "vision_cfg": {"image_size": 32, "layers": 2, "width": 64, "patch_size": 16},
        "text_cfg": {"context_length": 77, "vocab_size": 49408, "width": 64,
                     "heads": 4, "layers": 2},
    },
)


@pytest.fixture(scope="module")
def fixture_root(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("cap_fixture"))
    make_full_fixture(root, num_train=16, num_val=4, image_size=32)
    return root


def test_capped_encode_text_is_exact():
    tok = get_tokenizer()
    params = init_clip_params(jax.random.PRNGKey(0), TINY)
    texts = ["a photo of a dog.", "stripes", "many words in a row here",
             "zigzagged texture with bubbles"]
    full = tok(texts)                              # [4, 77]
    eots = np.argmax(full == tok.eot_token_id, axis=1)
    cap = int(-(-(eots.max() + 1) // 8) * 8)
    assert cap < 77
    f_full = np.asarray(clip_mod.encode_text(params, TINY, full, normalize=True))
    f_cap = np.asarray(clip_mod.encode_text(params, TINY, full[:, :cap], normalize=True))
    np.testing.assert_allclose(f_cap, f_full, atol=1e-6)


def test_truncate_forces_eot():
    tok = get_tokenizer()
    rows = tok(["short one", " ".join(["word"] * 70)])
    capped, lost = _truncate_tokens(rows, 16, tok.eot_token_id)
    assert capped.shape == (2, 16) and lost == 1
    assert (capped == tok.eot_token_id).any(axis=1).all()
    # short row unchanged up to its eot
    e = int(np.argmax(rows[0] == tok.eot_token_id))
    np.testing.assert_array_equal(capped[0, :e + 1], rows[0][:e + 1])


def test_apply_context_cap_auto(fixture_root):
    tok = get_tokenizer()
    class_names = [c.lower().replace("_", " ") for c in DEFAULT_CLASSES]
    data = build_train_data(
        os.path.join(fixture_root, "webdataset", "train_tars"),
        os.path.join(fixture_root, "clip_features_train.pkl"),
        [os.path.join(fixture_root, "captions_per_image")],
        [os.path.join(fixture_root, "captions_per_group")],
        class_names, tok,
    )
    table = tok([f"a photo of a {c}." for c in class_names])
    capped, table2, eff, truncated = apply_context_cap(
        data, "auto", tok.eot_token_id, table)
    assert eff % 8 == 0 and 16 <= eff <= 77
    assert truncated == 0  # auto covers the dataset max: nothing truncated
    assert table2.shape == (len(class_names), eff)
    for d in capped.per_image_tokens:
        for v in d.values():
            assert v.shape == (eff,)
            assert (v == tok.eot_token_id).any()
    # disabled cap is a no-op
    same, t_same, eff0, _ = apply_context_cap(data, 0, tok.eot_token_id, table)
    assert eff0 == 77 and t_same.shape[1] == 77


def test_pipeline_and_step_run_capped(fixture_root):
    tok = get_tokenizer()
    class_names = [c.lower().replace("_", " ") for c in DEFAULT_CLASSES]
    data = build_train_data(
        os.path.join(fixture_root, "webdataset", "train_tars"),
        os.path.join(fixture_root, "clip_features_train.pkl"),
        [os.path.join(fixture_root, "captions_per_image")],
        [os.path.join(fixture_root, "captions_per_group")],
        class_names, tok,
    )
    templates = [lambda c: f"{c} texture."]
    from latteclip_tpu.train.state import (
        build_template_table,
        create_train_state,
        init_memory_bank,
    )
    from latteclip_tpu.train.step import LatteHParams, make_train_step

    table = build_template_table(tok, class_names, templates)
    data, table, eff, _ = apply_context_cap(data, "auto", tok.eot_token_id, table)

    pipe = TrainPipeline(
        data, PipelineConfig(batch_size=8, image_size=32, num_threads=2),
        num_samples=16)
    batch = next(iter(pipe.epoch(0)))
    assert batch["per_image_tokens"].shape == (8, eff)
    assert batch["per_group_tokens"].shape == (8, eff)

    params = init_clip_params(jax.random.PRNGKey(0), TINY)
    bank = init_memory_bank(params, TINY, tok, class_names, templates)
    opt = optax.sgd(1e-3)
    state = create_train_state(params, opt, bank)
    step = jax.jit(make_train_step(TINY, opt, LatteHParams(augment=False), table))
    state, metrics = step(state, batch, jax.random.PRNGKey(0))
    assert np.isfinite(float(metrics["loss"]))
