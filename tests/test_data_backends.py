"""ImageFolder/CSV backends + YAML eval-task registry."""
import os

import numpy as np
import pytest
from PIL import Image

from latteclip_tpu.data.eval_config import expand_env, get_zero_shot_classification_data
from latteclip_tpu.data.folder_dataset import CsvDataset, ImageFolderDataset
from latteclip_tpu.data.synthetic import make_flat_dataset


@pytest.fixture(scope="module")
def folder_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("imagefolder")
    rng = np.random.RandomState(0)
    for cls in ("cat", "dog"):
        (root / cls).mkdir()
        for i in range(5):
            Image.fromarray(rng.randint(0, 255, (40, 40, 3), np.uint8)).save(root / cls / f"{i}.jpg")
    return str(root)


def test_image_folder_dataset(folder_root):
    ds = ImageFolderDataset(folder_root, image_size=32)
    assert len(ds) == 10
    assert ds.class_names == ["cat", "dog"]
    image_id, arr, label = ds.load_sample(0)
    assert arr.shape == (32, 32, 3) and label == 0
    assert ds.label_of(image_id) == 0


def test_image_folder_k_shot(folder_root):
    ds = ImageFolderDataset(folder_root, image_size=32, k_shot=2)
    assert len(ds) == 4  # 2 classes x 2 shots


def test_image_folder_with_zero_shot_eval(folder_root):
    import jax

    from latteclip_tpu.core.config import config_from_dict
    from latteclip_tpu.eval.zero_shot import build_zero_shot_classifier, run_zero_shot_eval
    from latteclip_tpu.models.clip import init_clip_params
    from latteclip_tpu.models.tokenizer import get_tokenizer

    tiny = config_from_dict("tiny", {
        "embed_dim": 32,
        "vision_cfg": {"image_size": 32, "layers": 2, "width": 64, "patch_size": 16},
        "text_cfg": {"context_length": 77, "vocab_size": 49408, "width": 64, "heads": 4, "layers": 2},
    })
    params = init_clip_params(jax.random.PRNGKey(0), tiny)
    ds = ImageFolderDataset(folder_root, image_size=32)
    classifier = build_zero_shot_classifier(
        params, tiny, get_tokenizer(), ds.display_class_names, ds.templates
    )
    from latteclip_tpu.data.eval_dataset import iter_batches

    metrics = run_zero_shot_eval(params, tiny, classifier, iter_batches(ds, 4, pad_final=True))
    assert metrics["n"] == 10


def test_csv_dataset(tmp_path, folder_root):
    csv_path = tmp_path / "data.tsv"
    with open(csv_path, "w") as f:
        f.write("filepath\ttitle\n")
        f.write(f"{folder_root}/cat/0.jpg\ta photo of a cat\n")
        f.write(f"{folder_root}/dog/0.jpg\ta photo of a dog\n")
    ds = CsvDataset(str(csv_path), image_size=32)
    assert len(ds) == 2
    arr, caption = ds.load_sample(1)
    assert arr.shape == (32, 32, 3) and caption == "a photo of a dog"


def test_yaml_eval_registry(tmp_path, monkeypatch):
    root = str(tmp_path / "dtd_preprocess")
    make_flat_dataset(root, num_train=4, num_val=4, image_size=32)
    monkeypatch.setenv("TEST_DATA_DIR", str(tmp_path))
    yaml_path = tmp_path / "eval.yaml"
    yaml_path.write_text(
        """
tasks:
  dtd_val_zeroshot_classification:
    dataset_loading_kwargs:
      dataset_name: "dtd_zero_shot"
    dataset_specific_kwargs:
      preprocess_path: $TEST_DATA_DIR/dtd_preprocess
      train: False
      transform: "default_clip"
"""
    )
    ds = get_zero_shot_classification_data(str(yaml_path), "dtd_val_zeroshot_classification", image_size=32)
    assert len(ds) == 4
    assert ds.templates[0]("banded") == "banded texture."
    with pytest.raises(KeyError):
        get_zero_shot_classification_data(str(yaml_path), "nope")
    assert expand_env("$TEST_DATA_DIR/x") == f"{tmp_path}/x"
