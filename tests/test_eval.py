"""End-to-end zero-shot eval slice on a synthetic flat dataset."""
import dataclasses
import pickle

import numpy as np
import pytest

from latteclip_tpu.core.config import config_from_dict
from latteclip_tpu.data.eval_dataset import FlatFileDataset, get_templates, iter_batches
from latteclip_tpu.data.synthetic import DEFAULT_CLASSES, make_flat_dataset
from latteclip_tpu.eval.features import extract_features
from latteclip_tpu.eval.zero_shot import (
    build_zero_shot_classifier,
    prototype_classifier,
    run_zero_shot_eval,
    topk_counts,
)
from latteclip_tpu.models.clip import init_clip_params
from latteclip_tpu.models.tokenizer import get_tokenizer

import jax

TINY = config_from_dict(
    "tiny",
    {
        "embed_dim": 32,
        "vision_cfg": {"image_size": 64, "layers": 2, "width": 64, "patch_size": 16},
        "text_cfg": {"context_length": 77, "vocab_size": 49408, "width": 64, "heads": 4, "layers": 2},
    },
)


@pytest.fixture(scope="module")
def flat_root(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("synth"))
    make_flat_dataset(root, num_train=12, num_val=10, image_size=64)
    return root


@pytest.fixture(scope="module")
def tiny_params():
    return init_clip_params(jax.random.PRNGKey(0), TINY)


def test_flat_dataset_reader(flat_root):
    ds = FlatFileDataset(flat_root, train=False, image_size=64, dataset_name="dtd")
    assert len(ds) == 10
    assert ds.class_names == list(DEFAULT_CLASSES)
    image_id, arr, label = ds.load_sample(0)
    assert arr.shape == (64, 64, 3) and arr.dtype == np.uint8
    assert 0 <= label < len(DEFAULT_CLASSES)
    assert ds.templates[0]("banded") == "banded texture."


def test_iter_batches_pads_final(flat_root):
    ds = FlatFileDataset(flat_root, train=False, image_size=64)
    batches = list(iter_batches(ds, 4, pad_final=True))
    assert sum(v for *_r, v in batches) == 10
    for _ids, images, labels, _valid in batches:
        assert images.shape == (4, 64, 64, 3)
        assert labels.shape == (4,)


def test_topk_counts_math():
    logits = np.array([[0.1, 0.9, 0.0, 0.0], [0.5, 0.1, 0.3, 0.2]])
    target = np.array([1, 2])
    a1, a2, a4 = topk_counts(logits, target, ks=(1, 2, 4))
    assert (a1, a2, a4) == (1.0, 2.0, 2.0)


def test_classifier_builder_matches_naive(tiny_params):
    """Chunked builder == per-class loop (template mean + renormalize)."""
    from latteclip_tpu.models import clip as clip_mod
    from latteclip_tpu.models.layers import l2_normalize

    tok = get_tokenizer()
    classnames = [f"class {i}" for i in range(7)]
    templates = [lambda c: f"a photo of a {c}.", lambda c: f"{c} texture."]
    classifier = np.asarray(
        build_zero_shot_classifier(tiny_params, TINY, tok, classnames, templates, chunk_classes=3)
    )
    naive = []
    for c in classnames:
        tokens = tok([t(c) for t in templates])
        feats = np.asarray(clip_mod.encode_text(tiny_params, TINY, tokens, normalize=True))
        mean = feats.mean(axis=0)
        naive.append(mean / np.linalg.norm(mean))
    naive = np.stack(naive).T
    np.testing.assert_allclose(classifier, naive, atol=2e-3)


def test_prototype_classifier_normalizes():
    bank = np.random.RandomState(0).randn(5, 32).astype(np.float32) * 3
    cls = np.asarray(prototype_classifier(bank))
    assert cls.shape == (32, 5)
    np.testing.assert_allclose(np.linalg.norm(cls, axis=0), 1.0, atol=1e-5)


def test_zero_shot_eval_end_to_end(flat_root, tiny_params):
    ds = FlatFileDataset(flat_root, train=False, image_size=64, dataset_name="dtd")
    tok = get_tokenizer()
    classifier = build_zero_shot_classifier(
        tiny_params, TINY, tok, ds.display_class_names, ds.templates
    )
    metrics = run_zero_shot_eval(tiny_params, TINY, classifier, iter_batches(ds, 4, pad_final=True))
    assert metrics["n"] == 10
    assert 0.0 <= metrics["top1"] <= metrics["top5"] <= metrics["top10"] <= 1.0


def test_extract_features_pkl_format(flat_root, tiny_params, tmp_path):
    ds = FlatFileDataset(flat_root, train=True, image_size=64, dataset_name="dtd")
    tok = get_tokenizer()
    feats = extract_features(
        tiny_params, TINY, tok, ds, str(tmp_path), "train", batch_size=5
    )
    with open(tmp_path / "clip_features_train.pkl", "rb") as f:
        loaded = pickle.load(f)
    assert set(loaded) == set(ds.image_ids)
    rec = loaded[ds.image_ids[0]]
    assert set(rec) == {"image", "top_class_ids", "class_names", "top_logit", "gt_classname", "gt_class_id"}
    assert rec["image"].shape == (TINY.embed_dim,)
    assert len(rec["class_names"]) == 4  # topk capped at num classes? no: topk=10 > 4 classes
    # logits over 4 classes -> top_class_ids has 4 entries (argsort width)
    assert rec["top_class_ids"].shape[0] == min(10, len(DEFAULT_CLASSES))
