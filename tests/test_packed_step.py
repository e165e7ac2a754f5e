"""--text-packing end-to-end: the packed v2 train step must be numerically
equivalent to the padded one.

tests/test_packing.py pins tower-level equivalence; here the claim is the
whole TRAINED TRAJECTORY: same batches, same init → same metrics and same
updated parameters whether the caption/template streams run padded-to-ctx
(the reference's layout, src/open_clip/tokenizer.py:250-258) or packed
variable-length (data/packing.py + segment-masked attention). Also covers
the pipeline's cap_* field emission and the row-bucketing rules.
"""
import os

import numpy as np
import pytest

import jax
import optax

from latteclip_tpu.core.config import config_from_dict
from latteclip_tpu.data.packing import (
    PackRowBucketer,
    pack_caption_batch,
    pack_rows_needed,
    pack_template_table,
    token_lengths,
)
from latteclip_tpu.data.pipeline import PipelineConfig, TrainPipeline, build_train_data
from latteclip_tpu.data.synthetic import DEFAULT_CLASSES, make_full_fixture
from latteclip_tpu.models.clip import init_clip_params
from latteclip_tpu.models.tokenizer import get_tokenizer
from latteclip_tpu.train.state import (
    build_template_table,
    create_train_state,
    init_memory_bank,
)
from latteclip_tpu.train.step import LatteHParams, make_train_step

TINY = config_from_dict(
    "tiny-packed",
    {
        "embed_dim": 16,
        "compute_dtype": "float32",
        "vision_cfg": {"image_size": 32, "layers": 2, "width": 64, "patch_size": 16},
        "text_cfg": {"context_length": 77, "vocab_size": 49408, "width": 64,
                     "heads": 4, "layers": 2},
    },
)
PACK = 128


@pytest.fixture(scope="module")
def fixture_root(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("packed_fixture"))
    make_full_fixture(root, num_train=16, num_val=4, image_size=32)
    return root


def _train_data(fixture_root, tok, class_names):
    return build_train_data(
        os.path.join(fixture_root, "webdataset", "train_tars"),
        os.path.join(fixture_root, "clip_features_train.pkl"),
        [os.path.join(fixture_root, "captions_per_image")],
        [os.path.join(fixture_root, "captions_per_group")],
        class_names, tok,
    )


def test_pipeline_emits_packed_fields(fixture_root):
    tok = get_tokenizer()
    class_names = [c.lower().replace("_", " ") for c in DEFAULT_CLASSES]
    data = _train_data(fixture_root, tok, class_names)
    pipe = TrainPipeline(
        data,
        PipelineConfig(batch_size=8, image_size=32, num_threads=2,
                       text_packing_len=PACK),
        num_samples=16,
    )
    batch = next(iter(pipe.epoch(0)))
    R = batch["cap_tokens"].shape[0]
    assert batch["cap_tokens"].shape == (R, PACK) and R % 8 == 0
    assert batch["cap_positions"].shape == (R, PACK)
    assert batch["cap_seg_ids"].shape == (R, PACK)
    assert batch["cap_eot_row"].shape == (16,) and batch["cap_eot_col"].shape == (16,)
    # every packed sequence reconstructs its padded source row exactly
    # (order pinned: [per_image (B), per_group (B)])
    src = np.concatenate([batch["per_image_tokens"], batch["per_group_tokens"]])
    lengths = token_lengths(src)
    for n in range(16):
        r, c = batch["cap_eot_row"][n], batch["cap_eot_col"][n]
        ln = int(lengths[n])
        np.testing.assert_array_equal(
            batch["cap_tokens"][r, c - ln + 1:c + 1], src[n, :ln])


def test_packed_step_trajectory_matches_padded(fixture_root):
    tok = get_tokenizer()
    class_names = [c.lower().replace("_", " ") for c in DEFAULT_CLASSES]
    data = _train_data(fixture_root, tok, class_names)
    templates = [lambda c: f"a photo of a {c}."]
    table = build_template_table(tok, class_names, templates)

    pipe = TrainPipeline(
        data, PipelineConfig(batch_size=8, image_size=32, num_threads=2),
        num_samples=16)
    batches = [b for _, b in zip(range(2), pipe.epoch(0))]
    bucket = PackRowBucketer(multiple=8)
    for b in batches:
        lengths = np.concatenate([
            token_lengths(b["per_image_tokens"]), token_lengths(b["per_group_tokens"])])
        rows = bucket.rows_for(pack_rows_needed(lengths, PACK))
        b.update(pack_caption_batch(
            b["per_image_tokens"], b["per_group_tokens"], PACK, rows))

    params = init_clip_params(jax.random.PRNGKey(0), TINY)
    bank = init_memory_bank(params, TINY, tok, class_names, templates)
    # SGD keeps the comparison at gradient scale; adaptive optimizers
    # amplify epsilon-level float-reassociation grad noise to ~lr per
    # element (second-moment normalization), which tests nothing
    opt = optax.sgd(1e-2)

    def run(hp, **kw):
        state = create_train_state(params, opt, bank)
        step = jax.jit(make_train_step(TINY, opt, hp, table, **kw))
        out = []
        for i, b in enumerate(batches * 2):  # 4 steps, batches reused
            state, metrics = step(state, b, jax.random.PRNGKey(7 + i))
            out.append(float(metrics["loss"]))
        return state, out

    s_pad, l_pad = run(LatteHParams(augment=False))
    s_pack, l_pack = run(
        LatteHParams(augment=False, text_packing=True),
        template_packed=pack_template_table(table, PACK),
    )

    np.testing.assert_allclose(l_pack, l_pad, rtol=0, atol=2e-5)
    flat_pad = jax.tree_util.tree_leaves_with_path(s_pad.params)
    flat_pack = dict(
        (jax.tree_util.keystr(k), v)
        for k, v in jax.tree_util.tree_leaves_with_path(s_pack.params))
    for k, v in flat_pad:
        np.testing.assert_allclose(
            flat_pack[jax.tree_util.keystr(k)], v, atol=2e-5,
            err_msg=f"param {jax.tree_util.keystr(k)} diverged")
    np.testing.assert_allclose(
        np.asarray(s_pack.memory_bank), np.asarray(s_pad.memory_bank), atol=2e-5)


def test_packed_classifier_build_matches_padded():
    from latteclip_tpu.eval.zero_shot import build_zero_shot_classifier

    tok = get_tokenizer()
    params = init_clip_params(jax.random.PRNGKey(1), TINY)
    classnames = [f"thing {i}" for i in range(13)]  # odd count: final pad chunk
    templates = [lambda c: f"a photo of a {c}.", lambda c: f"{c} up close."]
    padded = build_zero_shot_classifier(
        params, TINY, tok, classnames, templates, chunk_classes=4)
    packed = build_zero_shot_classifier(
        params, TINY, tok, classnames, templates, chunk_classes=4, packing=PACK)
    np.testing.assert_allclose(np.asarray(packed), np.asarray(padded), atol=1e-5)


def test_bucketer_rules():
    b = PackRowBucketer(multiple=8)
    r1 = b.rows_for(10)
    assert r1 % 8 == 0 and r1 >= 12      # need + slack, rounded up
    assert b.rows_for(5) == r1           # monotonic: never shrinks
    assert b.rows_for(100) >= 104        # grows when needed
    fixed = PackRowBucketer(multiple=8, fixed=32)
    assert fixed.rows_for(30) == 32
    with pytest.raises(ValueError):
        fixed.rows_for(33)


def test_multihost_requires_fixed_rows(fixture_root):
    tok = get_tokenizer()
    class_names = [c.lower().replace("_", " ") for c in DEFAULT_CLASSES]
    data = _train_data(fixture_root, tok, class_names)
    with pytest.raises(ValueError, match="multi-host"):
        TrainPipeline(
            data,
            PipelineConfig(batch_size=8, image_size=32, host_count=2,
                           text_packing_len=PACK),
            num_samples=16,
        )
    # pinned rows is accepted
    TrainPipeline(
        data,
        PipelineConfig(batch_size=8, image_size=32, host_count=2,
                       text_packing_len=PACK, text_packing_rows=64),
        num_samples=16,
    )
