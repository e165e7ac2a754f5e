"""Flat-file classification datasets + per-dataset prompt templates.

Reader semantics match the reference ``BaseDataset``
(``src/training/abo.py:80-156``): a ``preprocess_path`` directory holding
``webdataset/{train,val}/`` with ``{id}.jpg`` / ``{id}.json`` flat files and
``id_to_class.json`` / ``class_to_id.json`` at the root; samples are
``(image_id, image, class_id)``. The per-dataset prompt templates reproduce
``abo.py:159-447`` and the task registry replaces the reference's
``eval.yaml`` + Namespace plumbing (``abo.py:602-638``) with a plain
function; class names are lowercased with underscores replaced, as in
``abo.py:633``.

The loader is a thread-pooled host decoder producing uint8 numpy batches
(device-side normalization happens in the eval/train jit, see
``transforms.py``).
"""
from __future__ import annotations

import dataclasses
import json
import os
from concurrent.futures import ThreadPoolExecutor
from typing import Callable, Dict, Iterator, List, Tuple

import numpy as np

from latteclip_tpu.data import transforms as T

TemplateFn = Callable[[str], str]

# dataset key -> prompt template(s); reference abo.py:130,241,309,352,397,420
DATASET_TEMPLATES: Dict[str, List[TemplateFn]] = {
    "default": [lambda c: f"a photo of a {c}."],
    "dtd": [lambda c: f"{c} texture."],
    "eurosat": [lambda c: f"a photo of a {c}."],
    "sun397": [lambda c: f"a photo of a {c}."],
    "caltech101": [lambda c: f"a photo of a {c}."],
    "flower102": [lambda c: f"a photo of a {c}, a type of flower."],
    "oxford_pets": [lambda c: f"a photo of a {c}."],
    "fgvc_aircraft": [lambda c: f"a photo of a {c}, a type of aircraft."],
    "stanford_cars": [lambda c: f"a photo of a {c}."],
    "ucf101": [lambda c: f"a photo of a person doing {c}"],
    "food101": [lambda c: f"a photo of a {c}, a type of food."],
    "inat": [lambda c: f"a photo of a {c}."],
    "ifood2019": [lambda c: f"a photo of a {c}, a type of food."],
    "abo": [lambda c: f"a photo of a {c}."],
    "imagenet": [lambda c: f"a photo of a {c}."],
}


def get_templates(dataset: str) -> List[TemplateFn]:
    return DATASET_TEMPLATES.get(dataset, DATASET_TEMPLATES["default"])


@dataclasses.dataclass
class FlatFileDataset:
    """Reference-layout classification dataset (see module docstring)."""

    preprocess_path: str
    train: bool = False
    image_size: int = 224
    dataset_name: str = "default"
    id_to_class_file: str = "id_to_class.json"
    class_to_id_file: str = "class_to_id.json"
    class_name_field: str = "class_name"
    resize_mode: str = "shortest"   # per-model eval geometry (SigLIP: squash)

    def __post_init__(self):
        split = "train" if self.train else "val"
        self.split_path = os.path.join(self.preprocess_path, "webdataset", split)
        files = os.listdir(self.split_path)
        self.image_ids = sorted({os.path.splitext(f)[0] for f in files})

        with open(os.path.join(self.preprocess_path, self.id_to_class_file)) as f:
            id_to_class = json.load(f)
        with open(os.path.join(self.preprocess_path, self.class_to_id_file)) as f:
            self.class_to_id = json.load(f)
        max_id = max(int(k) for k in id_to_class)
        self.class_names: List[str] = [""] * (max_id + 1)
        for i, name in id_to_class.items():
            self.class_names[int(i)] = name
        self.templates = get_templates(self.dataset_name)

    def __len__(self) -> int:
        return len(self.image_ids)

    def label_of(self, image_id: str) -> int:
        with open(os.path.join(self.split_path, image_id + ".json")) as f:
            meta = json.load(f)
        return int(self.class_to_id[meta[self.class_name_field]])

    def load_image(self, index: int):
        """Raw PIL image for consumers that do their own geometry (TTA)."""
        image_id = self.image_ids[index]
        return T.load_rgb(os.path.join(self.split_path, image_id + ".jpg"))

    def load_sample(self, index: int) -> Tuple[str, np.ndarray, int]:
        image_id = self.image_ids[index]
        arr = T.eval_resize_crop(self.load_image(index), self.image_size, self.resize_mode)
        return image_id, arr, self.label_of(image_id)

    @property
    def display_class_names(self) -> List[str]:
        """Lowercased, underscore-free names fed to prompts (abo.py:633)."""
        return [c.lower().replace("_", " ") for c in self.class_names]


def iter_batches(
    dataset: FlatFileDataset,
    batch_size: int,
    *,
    num_threads: int = 8,
    drop_last: bool = False,
    pad_final: bool = False,
) -> Iterator[Tuple[List[str], np.ndarray, np.ndarray, int]]:
    """Yield (image_ids, uint8 images [B,S,S,3], labels [B], valid_count).

    With ``pad_final=True`` the last short batch is padded by repeating its
    first sample so every device batch has a static shape (XLA-friendly);
    ``valid_count`` tells the consumer how many rows are real.
    """
    from collections import deque

    n = len(dataset)

    def bounded_map(pool):
        # Executor.map submits ALL n jobs eagerly; with a consumer slower
        # than the pool (device busy between eval batches) the completed
        # futures buffer unboundedly many decoded images (~7.5 GB at
        # ImageNet-val scale). Keep at most 4*threads outstanding instead.
        inflight: "deque" = deque()
        idx = 0
        while idx < n or inflight:
            while idx < n and len(inflight) < 4 * num_threads:
                inflight.append(pool.submit(dataset.load_sample, idx))
                idx += 1
            yield inflight.popleft().result()

    with ThreadPoolExecutor(max_workers=num_threads) as pool:
        it = bounded_map(pool)
        buf_ids: List[str] = []
        buf_imgs: List[np.ndarray] = []
        buf_labels: List[int] = []
        for image_id, arr, label in it:
            buf_ids.append(image_id)
            buf_imgs.append(arr)
            buf_labels.append(label)
            if len(buf_ids) == batch_size:
                yield buf_ids, np.stack(buf_imgs), np.asarray(buf_labels, np.int32), batch_size
                buf_ids, buf_imgs, buf_labels = [], [], []
        if buf_ids and not drop_last:
            valid = len(buf_ids)
            if pad_final:
                while len(buf_ids) < batch_size:
                    buf_ids.append(buf_ids[0])
                    buf_imgs.append(buf_imgs[0])
                    buf_labels.append(buf_labels[0])
            yield buf_ids, np.stack(buf_imgs), np.asarray(buf_labels, np.int32), valid
