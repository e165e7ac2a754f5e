"""Test-time adaptation: AugMix views, prompt context, TPT/RLCF loops."""
import numpy as np
import pytest
from PIL import Image

import jax
import jax.numpy as jnp

from latteclip_tpu.core.config import config_from_dict
from latteclip_tpu.data.augmix import augmix, augmix_views
from latteclip_tpu.data.eval_dataset import FlatFileDataset
from latteclip_tpu.data.synthetic import make_flat_dataset
from latteclip_tpu.eval.tta import (
    TTAConfig,
    avg_entropy,
    build_prompt_context,
    evaluate_tta,
    prompt_text_features,
    select_confident,
)
from latteclip_tpu.models.clip import init_clip_params
from latteclip_tpu.models.tokenizer import get_tokenizer

TINY = config_from_dict(
    "tiny",
    {
        "embed_dim": 32,
        "vision_cfg": {"image_size": 64, "layers": 2, "width": 64, "patch_size": 16},
        "text_cfg": {"context_length": 77, "vocab_size": 49408, "width": 64, "heads": 4, "layers": 2},
    },
)
CLASSES = ["banded", "dotted", "striped", "zigzagged"]


@pytest.fixture(scope="module")
def setup(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("tta"))
    make_flat_dataset(root, num_train=4, num_val=6, image_size=64)
    params = init_clip_params(jax.random.PRNGKey(0), TINY)
    tok = get_tokenizer()
    ds = FlatFileDataset(root, train=False, image_size=64, dataset_name="dtd")
    return params, tok, ds


def test_augmix_views_shapes():
    img = Image.fromarray(np.random.RandomState(0).randint(0, 255, (80, 96, 3), np.uint8))
    views = augmix_views(img, 64, n_views=7, rng=np.random.default_rng(0))
    assert views.shape == (8, 64, 64, 3) and views.dtype == np.uint8
    # views differ from base and from each other
    assert not np.array_equal(views[1], views[0])
    assert not np.array_equal(views[1], views[2])


def test_avg_entropy_and_selection():
    confident = jnp.asarray([[10.0, 0.0, 0.0], [9.0, 0.0, 0.0]])
    uncertain = jnp.asarray([[0.1, 0.0, 0.05], [0.0, 0.1, 0.1]])
    assert float(avg_entropy(confident)) < float(avg_entropy(uncertain))
    logits = jnp.concatenate([uncertain, confident])
    idx = np.asarray(select_confident(logits, 0.5))
    assert set(idx.tolist()) == {2, 3}


def test_prompt_context_roundtrip(setup):
    params, tok, _ds = setup
    prompt = build_prompt_context(params, TINY, tok, CLASSES, ctx_init="a photo of a")
    assert prompt.n_ctx == 4
    assert prompt.tokens.shape[0] == len(CLASSES)
    feats = prompt_text_features(params, TINY, prompt, prompt.init_ctx)
    assert feats.shape == (len(CLASSES), TINY.embed_dim)
    np.testing.assert_allclose(np.linalg.norm(np.asarray(feats), axis=1), 1.0, atol=1e-5)
    # with init ctx, the spliced prompt equals tokenizing the real phrase
    direct_tokens = tok([f"a photo of a {c}." for c in CLASSES])
    from latteclip_tpu.models.clip import encode_text

    direct = np.asarray(encode_text(params, TINY, direct_tokens, normalize=True))
    np.testing.assert_allclose(np.asarray(feats), direct, atol=2e-2)


def test_tpt_evaluate_runs(setup):
    params, tok, ds = setup
    metrics = evaluate_tta(
        params, TINY, tok, ds,
        TTAConfig(n_views=7, tta_steps=2, selection_p=0.25),
        max_samples=3,
    )
    assert metrics["n"] == 3
    assert 0.0 <= metrics["tta_top1"] <= 1.0


def test_rlcf_evaluate_runs(setup):
    params, tok, ds = setup
    # reward model: an independent tiny CLIP
    reward_params = init_clip_params(jax.random.PRNGKey(9), TINY)
    metrics = evaluate_tta(
        params, TINY, tok, ds,
        TTAConfig(n_views=7, tta_steps=1, selection_p=0.25, sample_k=2),
        method="rlcf",
        reward_params=reward_params,
        reward_cfg=TINY,
        max_samples=2,
    )
    assert metrics["n"] == 2
