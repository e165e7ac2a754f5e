"""Preprocess tooling: converter, tar packer, caption jobs, retrieval, analysis."""
import json
import os
import pickle

import numpy as np
import pytest
from PIL import Image

from latteclip_tpu.data.synthetic import DEFAULT_CLASSES, make_full_fixture
from latteclip_tpu.data.tar_reader import iter_tar_samples
from latteclip_tpu.preprocess.captions import (
    EchoCaptioner,
    extract_group_captions,
    extract_per_image_captions,
    make_image_grid,
)
from latteclip_tpu.preprocess.create_tarfiles import pack
from latteclip_tpu.preprocess.to_webdataset import convert


@pytest.fixture(scope="module")
def coop_dataset(tmp_path_factory):
    """A miniature CoOp-format source dataset."""
    root = tmp_path_factory.mktemp("coop_src")
    img_dir = root / "images"
    img_dir.mkdir()
    rng = np.random.RandomState(0)
    classes = ["banded", "dotted"]
    split = {"train": [], "val": [], "test": []}
    idx = 0
    for split_name, count in (("train", 6), ("val", 2), ("test", 4)):
        for _ in range(count):
            cls_id = idx % 2
            rel = f"{classes[cls_id]}/img_{idx:03d}.jpg"
            (img_dir / classes[cls_id]).mkdir(exist_ok=True)
            Image.fromarray(rng.randint(0, 255, (32, 32, 3), np.uint8)).save(img_dir / rel)
            split[split_name].append([rel, cls_id, classes[cls_id]])
            idx += 1
    with open(root / "split_zhou_DescribableTextures.json", "w") as f:
        json.dump(split, f)
    return str(root)


def test_to_webdataset_conversion(coop_dataset, tmp_path):
    out = str(tmp_path / "pre")
    counts = convert("dtd", coop_dataset, out)
    assert counts == {"train": 8, "val": 4}  # train+val -> train, test -> val
    with open(os.path.join(out, "id_to_class.json")) as f:
        assert set(json.load(f).values()) == {"banded", "dotted"}
    train_dir = os.path.join(out, "webdataset", "train")
    ids = {os.path.splitext(f)[0] for f in os.listdir(train_dir)}
    assert len(ids) == 8
    some_id = sorted(ids)[0]
    with open(os.path.join(train_dir, some_id + ".json")) as f:
        meta = json.load(f)
    assert set(meta) == {"image_id", "class_name"}
    # empty caption placeholder written
    assert os.path.exists(os.path.join(train_dir, some_id + ".txt"))


def test_tar_packer_roundtrip(coop_dataset, tmp_path):
    out = str(tmp_path / "pre")
    convert("dtd", coop_dataset, out)
    train_dir = os.path.join(out, "webdataset", "train")
    shards = pack(train_dir, str(tmp_path / "tars"), items_per_tar=3)
    assert len(shards) == 3  # 8 ids / 3 per tar
    samples = [s for sh in shards for s in iter_tar_samples(sh)]
    assert len(samples) == 8
    assert all({"jpg", "txt", "json"} <= set(s) for s in samples)


@pytest.fixture(scope="module")
def caption_fixture(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("capfix"))
    make_full_fixture(root, num_train=8, num_val=4, image_size=32)
    return root


def test_per_image_captions(caption_fixture, tmp_path):
    tars = [os.path.join(caption_fixture, "webdataset", "train_tars", "00000.tar")]
    out = str(tmp_path / "caps")
    n = extract_per_image_captions(
        tars, os.path.join(caption_fixture, "clip_features_train.pkl"),
        out, EchoCaptioner(), "Describe the {} texture concisely.",
    )
    assert n == 8
    files = os.listdir(out)
    assert len(files) == 8
    text = open(os.path.join(out, files[0])).read()
    assert "describe the" in text
    # resumable: second run writes nothing
    assert extract_per_image_captions(
        tars, os.path.join(caption_fixture, "clip_features_train.pkl"),
        out, EchoCaptioner(), "x",
    ) == 0


def test_group_captions_and_grid(caption_fixture, tmp_path):
    grid = make_image_grid([Image.new("RGB", (50, 60))] * 4, cell=336)
    assert grid.size == (672, 672)
    tars = [os.path.join(caption_fixture, "webdataset", "train_tars", "00000.tar")]
    out = str(tmp_path / "gcaps")
    n = extract_group_captions(
        tars, os.path.join(caption_fixture, "clip_features_train.pkl"),
        out, EchoCaptioner(), "Describe the common visual attributes.",
        split_dir=os.path.join(caption_fixture, "webdataset", "train"),
    )
    assert n == 8 and len(os.listdir(out)) == 8


def test_retrieval_metrics_identity():
    from latteclip_tpu.eval.retrieval import clip_retrieval_metrics

    feats = np.eye(8, 16, dtype=np.float32)
    m = clip_retrieval_metrics(feats, feats, 100.0)
    assert m["image_to_text_R@1"] == 1.0
    assert m["text_to_image_mean_rank"] == 1.0


def test_group_weight_analysis(caption_fixture, tmp_path):
    import jax

    from latteclip_tpu.core.config import config_from_dict
    from latteclip_tpu.data.eval_dataset import get_templates
    from latteclip_tpu.data.pipeline import build_train_data
    from latteclip_tpu.eval.group_weights import extract_group_weights
    from latteclip_tpu.models.clip import init_clip_params
    from latteclip_tpu.models.tokenizer import get_tokenizer
    from latteclip_tpu.train.state import init_memory_bank

    tiny = config_from_dict("tiny", {
        "embed_dim": 32,
        "vision_cfg": {"image_size": 32, "layers": 2, "width": 64, "patch_size": 16},
        "text_cfg": {"context_length": 77, "vocab_size": 49408, "width": 64, "heads": 4, "layers": 2},
    })
    params = init_clip_params(jax.random.PRNGKey(0), tiny)
    tok = get_tokenizer()
    classes = [c.lower() for c in DEFAULT_CLASSES]
    templates = get_templates("dtd")
    bank = init_memory_bank(params, tiny, tok, classes, templates)
    data = build_train_data(
        os.path.join(caption_fixture, "webdataset", "train_tars"),
        os.path.join(caption_fixture, "clip_features_train.pkl"),
        [os.path.join(caption_fixture, "captions_per_image")],
        [os.path.join(caption_fixture, "captions_per_group")],
        classes, tok,
    )
    out = str(tmp_path / "gw")
    weights = extract_group_weights(
        params, tiny, data, np.asarray(bank), templates, tok, out,
        batch_size=4, image_size=32,
    )
    assert (weights > 0).all() and (weights < 1).all()
    # EVERY sample appears exactly once, including the non-multiple-of-B tail
    # (batch_size=4 above; the fixture is deliberately not a multiple)
    assert len(weights) == len(data.zs_top1)
    labels = json.load(open(os.path.join(out, "all_labels.json")))
    assert len(labels) == len(weights)
    assert {"zs_lb", "ft_lb", "gt_lb", "per_image_text", "per_image_group_text"} <= set(labels[0])
