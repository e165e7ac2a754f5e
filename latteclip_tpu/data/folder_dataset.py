"""Class-subdirectory (ImageFolder) dataset + CSV dataset backends.

``ImageFolderDataset`` covers torchvision-ImageFolder-layout data (the
reference's ImageNet eval path, ``src/training/data.py:142-186``), exposing
the same `(image_id, uint8 image, class_id)` sample interface as
``FlatFileDataset`` so the zero-shot eval stack works unchanged. Supports
the reference's k-shot subsetting (``get_imagenet`` with ``r50-subset``
sampling semantics simplified to uniform k-per-class).

``CsvDataset`` covers the generic filepath/caption CSV backend (reference
``data.py:50-70``) for plain contrastive training data.
"""
from __future__ import annotations

import csv
import os
from typing import List, Optional, Tuple

import numpy as np

from latteclip_tpu.data import transforms as T
from latteclip_tpu.data.eval_dataset import get_templates


class ImageFolderDataset:
    """root/<classname>/<image> layout -> eval-compatible dataset."""

    IMG_EXTS = (".jpg", ".jpeg", ".png", ".webp", ".bmp")

    def __init__(
        self,
        root: str,
        image_size: int = 224,
        dataset_name: str = "imagenet",
        k_shot: Optional[int] = None,
        seed: int = 0,
    ):
        self.root = root
        self.image_size = image_size
        self.class_names = sorted(
            d for d in os.listdir(root) if os.path.isdir(os.path.join(root, d))
        )
        self.class_to_id = {c: i for i, c in enumerate(self.class_names)}
        rng = np.random.default_rng(seed)
        self.samples: List[Tuple[str, int]] = []
        for cls in self.class_names:
            files = sorted(
                f for f in os.listdir(os.path.join(root, cls))
                if f.lower().endswith(self.IMG_EXTS)
            )
            if k_shot is not None and len(files) > k_shot:
                files = list(rng.choice(files, size=k_shot, replace=False))
            self.samples.extend((os.path.join(cls, f), self.class_to_id[cls]) for f in files)
        self.image_ids = [path for path, _ in self.samples]
        self.templates = get_templates(dataset_name)

    def __len__(self) -> int:
        return len(self.samples)

    def label_of(self, image_id: str) -> int:
        return self.class_to_id[os.path.dirname(image_id)]

    def load_image(self, index: int):
        """Raw PIL image (shared TTA/eval loading interface)."""
        rel, _ = self.samples[index]
        return T.load_rgb(os.path.join(self.root, rel))

    def load_sample(self, index: int) -> Tuple[str, np.ndarray, int]:
        rel, label = self.samples[index]
        return rel, T.eval_resize_crop(self.load_image(index), self.image_size), label

    @property
    def display_class_names(self) -> List[str]:
        return [c.lower().replace("_", " ") for c in self.class_names]


class CsvDataset:
    """CSV of (filepath, caption) rows (reference CsvDataset, data.py:50-70)."""

    def __init__(
        self,
        input_filename: str,
        img_key: str = "filepath",
        caption_key: str = "title",
        sep: str = "\t",
        image_size: int = 224,
        root: Optional[str] = None,
    ):
        self.image_size = image_size
        self.root = root or os.path.dirname(os.path.abspath(input_filename))
        with open(input_filename, newline="") as f:
            reader = csv.DictReader(f, delimiter=sep)
            self.rows = [(r[img_key], r[caption_key]) for r in reader]

    def __len__(self) -> int:
        return len(self.rows)

    def load_sample(self, index: int) -> Tuple[np.ndarray, str]:
        path, caption = self.rows[index]
        if not os.path.isabs(path):
            path = os.path.join(self.root, path)
        img = T.load_rgb(path)
        return T.eval_resize_crop(img, self.image_size), caption
