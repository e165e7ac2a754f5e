"""Functional stand-ins that let the reference's REAL ``training.main`` run
end-to-end in this environment (no webdataset / braceexpand / torchvision /
ftfy installed).

Unlike ``ref_oracle``'s inert stubs (enough to *import* the reference),
these are behavior-complete for the code paths the LatteCLIP driver actually
exercises: the webdataset tar pipeline (reference src/training/data.py:
557-688), brace URL expansion, and the PIL image transforms open_clip's
``image_transform`` builds (reference src/open_clip/transform.py:290-425).

Faithfulness notes:
- tar reading / grouping / renaming / batching reproduce webdataset
  semantics exactly (pure iterator algebra, reimplemented from the call
  sites' observable contract);
- deterministic-shuffle (detshuffle2) reproduces exactly: the reference
  supplies its own rng, we only provide ``_shuffle``;
- ``wds.shuffle``'s default rng is TIME-seeded in real webdataset; the stub
  seeds it deterministically (0) so reference runs are reproducible — order
  still differs from our pipeline, so E2E train comparisons stay
  order-insensitive;
- eval transforms (Resize shortest / CenterCrop / ToTensor / Normalize) use
  the same PIL calls torchvision dispatches to on PIL inputs — bit-exact;
- train-time random augs (RandomResizedCrop / ColorJitter / Grayscale) are
  distribution-faithful but draw from ``random`` instead of torch RNG (the
  reference's own draws are not reproducible across torch versions either).
"""
from __future__ import annotations

import importlib.machinery
import io
import itertools
import json
import os
import random as _random
import re
import sys
import tarfile
import types

import numpy as np
from PIL import Image, ImageEnhance


def _module(name: str) -> types.ModuleType:
    mod = types.ModuleType(name)
    mod.__spec__ = importlib.machinery.ModuleSpec(name, loader=None)
    sys.modules[name] = mod
    return mod


# --------------------------------------------------------------------------
# braceexpand
# --------------------------------------------------------------------------

_RANGE = re.compile(r"\{(\d+)\.\.(\d+)\}")
_ALT = re.compile(r"\{([^{}]*,[^{}]*)\}")


def braceexpand(pattern):
    m = _RANGE.search(pattern)
    if m:
        lo, hi = m.group(1), m.group(2)
        width = len(lo) if lo.startswith("0") else 0
        for i in range(int(lo), int(hi) + 1):
            fill = str(i).zfill(width) if width else str(i)
            yield from braceexpand(pattern[:m.start()] + fill + pattern[m.end():])
        return
    m = _ALT.search(pattern)
    if m:
        for alt in m.group(1).split(","):
            yield from braceexpand(pattern[:m.start()] + alt + pattern[m.end():])
        return
    yield pattern


# --------------------------------------------------------------------------
# webdataset
# --------------------------------------------------------------------------

def _shuffle(data, bufsize=1000, initial=100, rng=None, handler=None):
    """Buffered streaming shuffle (webdataset.filters._shuffle semantics)."""
    if rng is None:
        rng = _random.Random(0)  # real wds: time-seeded; see module docstring
    initial = min(initial, bufsize)
    buf = []

    def pick():
        k = rng.randint(0, len(buf) - 1)
        sample = buf[k]
        buf[k] = buf[-1]
        buf.pop()
        return sample

    data = iter(data)
    for sample in data:
        buf.append(sample)
        if len(buf) < bufsize:
            try:
                buf.append(next(data))
            except StopIteration:
                pass
        if len(buf) >= initial:
            yield pick()
    while buf:
        yield pick()


def base_plus_ext(path):
    """Split basename at the FIRST dot: 'a/b.c.d' -> ('a/b', 'c.d')."""
    m = re.match(r"^((?:.*/|)[^.]+)[.]([^/]*)$", path)
    if not m:
        return None, None
    return m.group(1), m.group(2)


def valid_sample(sample):
    return (
        sample is not None
        and isinstance(sample, dict)
        and len(sample) > 0
        and any(not k.startswith("__") for k in sample)
    )


def url_opener(data, handler=None, **kw):
    for sample in data:
        url = sample["url"]
        try:
            stream = open(url, "rb")
            yield dict(sample, stream=stream)
        except Exception as exn:  # noqa: BLE001
            if handler is None or not handler(exn):
                raise


def tar_file_expander(data, handler=None, **kw):
    for source in data:
        url = source["url"]
        try:
            with tarfile.open(fileobj=source["stream"], mode="r|*") as tf:
                for member in tf:
                    if not member.isfile():
                        continue
                    fname = member.name
                    if fname.startswith("./"):
                        fname = fname[2:]
                    data_bytes = tf.extractfile(member).read()
                    yield dict(fname=fname, data=data_bytes, __url__=url)
            source["stream"].close()
        except Exception as exn:  # noqa: BLE001
            if handler is None or not handler(exn):
                raise


def _group_by_keys(data, keys=base_plus_ext, lcase=True, suffixes=None, handler=None):
    current = None
    for fs in data:
        if "fname" not in fs:
            continue
        prefix, suffix = keys(fs["fname"])
        if prefix is None:
            continue
        if lcase:
            suffix = suffix.lower()
        if current is None or prefix != current["__key__"] or suffix in current:
            if valid_sample(current):
                yield current
            current = dict(__key__=prefix, __url__=fs["__url__"])
        if suffixes is None or suffix in suffixes:
            current[suffix] = fs["data"]
    if valid_sample(current):
        yield current


def _pipelinefilter(fn):
    def curried(*args, **kw):
        return lambda src: fn(src, *args, **kw)

    return curried


def _decode_value(key, value):
    ext = key.split(".")[-1].lower()
    if ext in ("jpg", "jpeg", "png", "webp", "ppm", "pgm", "pbm"):
        img = Image.open(io.BytesIO(value))
        img.load()
        return img.convert("RGB")
    if ext == "json":
        return json.loads(value)
    if ext in ("txt", "text", "caption"):
        return value.decode("utf-8")
    if ext in ("cls", "cls2", "index"):
        return int(value)
    return value


def _decode(data, *specs, handler=None):
    for sample in data:
        try:
            yield {
                k: (_decode_value(k, v) if not k.startswith("__") else v)
                for k, v in sample.items()
            }
        except Exception as exn:  # noqa: BLE001
            if handler is None or not handler(exn):
                raise


def _select(data, predicate):
    for sample in data:
        if predicate(sample):
            yield sample


def _map(data, fn, handler=None):
    for sample in data:
        try:
            out = fn(sample)
        except Exception as exn:  # noqa: BLE001
            if handler is None or not handler(exn):
                raise
            continue
        if out is not None:
            yield out


def _map_dict(data, handler=None, **fns):
    for sample in data:
        try:
            yield {k: (fns[k](v) if k in fns else v) for k, v in sample.items()}
        except Exception as exn:  # noqa: BLE001
            if handler is None or not handler(exn):
                raise


def _rename(data, keep=True, handler=None, **kw):
    consumed_targets = set(kw)
    for sample in data:
        try:
            out = {k: v for k, v in sample.items() if k.startswith("__")}
            sources_used = set()
            for target, srcs in kw.items():
                for src in srcs.split(";"):
                    if src in sample:
                        out[target] = sample[src]
                        sources_used.add(src)
                        break
            if keep:
                for k, v in sample.items():
                    if (not k.startswith("__") and k not in sources_used
                            and k not in consumed_targets):
                        out[k] = v
            yield out
        except Exception as exn:  # noqa: BLE001
            if handler is None or not handler(exn):
                raise


def _to_tuple(data, *keys, handler=None):
    # webdataset also accepts a single "a b c" spec string
    if len(keys) == 1 and isinstance(keys[0], str) and " " in keys[0]:
        keys = keys[0].split()
    for sample in data:
        try:
            yield tuple(sample[k] for k in keys)
        except Exception as exn:  # noqa: BLE001
            if handler is None or not handler(exn):
                raise


def _default_collate(samples):
    import torch

    batch = []
    for field in zip(*samples):
        first = field[0]
        if isinstance(first, torch.Tensor):
            batch.append(torch.stack(list(field)))
        elif isinstance(first, np.ndarray):
            batch.append(np.stack(list(field)))
        else:
            batch.append(list(field))
    return tuple(batch)


def _batched(data, batchsize, collation_fn=_default_collate, partial=True):
    buf = []
    for sample in data:
        buf.append(sample)
        if len(buf) == batchsize:
            yield collation_fn(buf)
            buf = []
    if buf and partial:
        yield collation_fn(buf)


class _PipelineStage:
    def run(self, src):  # pragma: no cover - overridden
        raise NotImplementedError


class _SimpleShardList:
    def __init__(self, urls, seed=None):
        if isinstance(urls, str):
            urls = [u for part in urls.split("::") for u in braceexpand(part)]
        self.urls = list(urls)

    def __iter__(self):
        for url in self.urls:
            yield dict(url=url)

    def __len__(self):
        return len(self.urls)


def _split_by_node(src):
    yield from src  # single process


def _split_by_worker(src):
    yield from src  # num_workers == 0


class _DataPipeline:
    def __init__(self, *stages):
        self.stages = list(stages)
        self.nsamples = -1

    def _iterate_once(self):
        it = iter(self.stages[0])
        for stage in self.stages[1:]:
            if isinstance(stage, _PipelineStage):
                it = stage.run(it)
            elif callable(stage):
                it = stage(it)
            else:
                it = iter(stage)
        return it

    def with_epoch(self, nsamples):
        self.nsamples = nsamples
        return self

    def __iter__(self):
        if self.nsamples <= 0:
            yield from self._iterate_once()
            return
        # with_epoch semantics: each epoch yields exactly nsamples items,
        # restarting the (freshly shuffled) pipeline as needed
        def forever():
            while True:
                yield from self._iterate_once()

        yield from itertools.islice(forever(), self.nsamples)


class _WebLoader:
    """Single-process stand-in for wds.WebLoader (torch DataLoader wrap)."""

    def __init__(self, dataset, batch_size=None, shuffle=False, num_workers=0,
                 persistent_workers=False, **kw):
        assert batch_size is None and not shuffle
        self.dataset = dataset

    def __iter__(self):
        return iter(self.dataset)


def _pytorch_worker_seed(increment=0):
    return 0 + increment


def install_webdataset():
    wds = _module("webdataset")
    wds.SimpleShardList = _SimpleShardList
    wds.PipelineStage = _PipelineStage
    wds.DataPipeline = _DataPipeline
    wds.WebLoader = _WebLoader
    wds.split_by_node = _split_by_node
    wds.split_by_worker = _split_by_worker
    wds.shuffle = _pipelinefilter(_shuffle)
    wds.select = _pipelinefilter(_select)
    wds.decode = _pipelinefilter(_decode)
    wds.rename = _pipelinefilter(_rename)
    wds.map = _pipelinefilter(_map)
    wds.map_dict = _pipelinefilter(_map_dict)
    wds.to_tuple = _pipelinefilter(_to_tuple)
    wds.batched = _pipelinefilter(_batched)

    def tarfile_to_samples(handler=None):
        def stage(src):
            return _group_by_keys(
                tar_file_expander(url_opener(src, handler=handler), handler=handler),
                handler=handler,
            )

        return stage

    wds.tarfile_to_samples = tarfile_to_samples

    filters = _module("webdataset.filters")
    filters._shuffle = _shuffle
    wds.filters = filters

    tariterators = _module("webdataset.tariterators")
    tariterators.base_plus_ext = base_plus_ext
    tariterators.url_opener = url_opener
    tariterators.tar_file_expander = tar_file_expander
    tariterators.valid_sample = valid_sample
    wds.tariterators = tariterators

    utils = _module("webdataset.utils")
    utils.pytorch_worker_seed = _pytorch_worker_seed
    wds.utils = utils

    shardlists = _module("webdataset.shardlists")
    shardlists.expand_urls = lambda urls: (
        [u for part in urls.split("::") for u in braceexpand(part)]
        if isinstance(urls, str) else list(urls)
    )
    wds.shardlists = shardlists
    return wds


# --------------------------------------------------------------------------
# torchvision (functional PIL transforms)
# --------------------------------------------------------------------------

_PIL_MODES = {"bicubic": Image.BICUBIC, "bilinear": Image.BILINEAR,
              "nearest": Image.NEAREST, "lanczos": Image.LANCZOS}


class _InterpolationMode:
    BICUBIC = "bicubic"
    BILINEAR = "bilinear"
    NEAREST = "nearest"
    LANCZOS = "lanczos"


def _resize_shortest(img, size, interpolation):
    resample = _PIL_MODES[interpolation]
    if isinstance(size, (tuple, list)):
        if len(size) == 1:
            size = size[0]
        else:
            return img.resize((size[1], size[0]), resample)
    w, h = img.size
    short, long = (w, h) if w <= h else (h, w)
    if short == size:
        return img
    new_short, new_long = size, int(round(size * long / short))
    nw, nh = (new_short, new_long) if w <= h else (new_long, new_short)
    return img.resize((nw, nh), resample)


class _Resize:
    def __init__(self, size, interpolation=_InterpolationMode.BILINEAR,
                 max_size=None, antialias=True):
        self.size = size
        self.interpolation = interpolation

    def __call__(self, img):
        return _resize_shortest(img, self.size, self.interpolation)


class _CenterCrop:
    def __init__(self, size):
        self.size = (size, size) if isinstance(size, int) else tuple(size)

    def __call__(self, img):
        th, tw = self.size
        w, h = img.size
        if w < tw or h < th:  # torchvision pads smaller images with 0
            padded = Image.new("RGB", (max(w, tw), max(h, th)), (0, 0, 0))
            padded.paste(img, ((max(w, tw) - w) // 2, (max(h, th) - h) // 2))
            img, (w, h) = padded, padded.size
        left = int(round((w - tw) / 2.0))
        top = int(round((h - th) / 2.0))
        return img.crop((left, top, left + tw, top + th))


class _RandomResizedCrop:
    def __init__(self, size, scale=(0.08, 1.0), ratio=(3.0 / 4.0, 4.0 / 3.0),
                 interpolation=_InterpolationMode.BILINEAR, antialias=True):
        self.size = (size, size) if isinstance(size, int) else tuple(size)
        self.scale, self.ratio = scale, ratio
        self.interpolation = interpolation

    def __call__(self, img):
        w, h = img.size
        area = w * h
        log_ratio = (np.log(self.ratio[0]), np.log(self.ratio[1]))
        for _ in range(10):
            target_area = area * _random.uniform(*self.scale)
            aspect = np.exp(_random.uniform(*log_ratio))
            cw = int(round(np.sqrt(target_area * aspect)))
            ch = int(round(np.sqrt(target_area / aspect)))
            if 0 < cw <= w and 0 < ch <= h:
                left = _random.randint(0, w - cw)
                top = _random.randint(0, h - ch)
                crop = img.crop((left, top, left + cw, top + ch))
                return crop.resize(self.size[::-1], _PIL_MODES[self.interpolation])
        # fallback: center crop to in-ratio box
        return _CenterCrop(min(w, h))(img).resize(
            self.size[::-1], _PIL_MODES[self.interpolation])


class _ToTensor:
    def __call__(self, img):
        import torch

        arr = np.asarray(img, dtype=np.float32) / 255.0
        if arr.ndim == 2:
            arr = arr[:, :, None]
        return torch.from_numpy(arr.transpose(2, 0, 1).copy())


class _Normalize:
    def __init__(self, mean, std, inplace=False):
        self.mean, self.std = mean, std

    def __call__(self, tensor):
        import torch

        mean = torch.tensor(self.mean, dtype=tensor.dtype).view(-1, 1, 1)
        std = torch.tensor(self.std, dtype=tensor.dtype).view(-1, 1, 1)
        return (tensor - mean) / std


class _Compose:
    def __init__(self, transforms):
        self.transforms = list(transforms)

    def __call__(self, x):
        for t in self.transforms:
            x = t(x)
        return x


class _ColorJitter:
    def __init__(self, brightness=0, contrast=0, saturation=0, hue=0):
        self.brightness, self.contrast = brightness, contrast
        self.saturation, self.hue = saturation, hue

    def __call__(self, img):
        ops = []
        if self.brightness:
            f = _random.uniform(max(0, 1 - self.brightness), 1 + self.brightness)
            ops.append(lambda im, f=f: ImageEnhance.Brightness(im).enhance(f))
        if self.contrast:
            f = _random.uniform(max(0, 1 - self.contrast), 1 + self.contrast)
            ops.append(lambda im, f=f: ImageEnhance.Contrast(im).enhance(f))
        if self.saturation:
            f = _random.uniform(max(0, 1 - self.saturation), 1 + self.saturation)
            ops.append(lambda im, f=f: ImageEnhance.Color(im).enhance(f))
        if self.hue:
            shift = _random.uniform(-self.hue, self.hue)

            def hue_op(im, shift=shift):
                hsv = np.asarray(im.convert("HSV")).copy()
                hsv[..., 0] = (hsv[..., 0].astype(np.int32)
                               + int(shift * 255)) % 256
                return Image.fromarray(hsv, "HSV").convert("RGB")

            ops.append(hue_op)
        _random.shuffle(ops)
        for op in ops:
            img = op(img)
        return img


class _Grayscale:
    def __init__(self, num_output_channels=1):
        self.n = num_output_channels

    def __call__(self, img):
        gray = img.convert("L")
        return gray.convert("RGB") if self.n == 3 else gray


class _GaussianBlur:
    def __init__(self, kernel_size, sigma=(0.1, 2.0)):
        self.sigma = sigma

    def __call__(self, img):
        from PIL import ImageFilter

        s = (_random.uniform(*self.sigma)
             if isinstance(self.sigma, (tuple, list)) else self.sigma)
        return img.filter(ImageFilter.GaussianBlur(radius=s))


class _RandomApply:
    def __init__(self, transforms, p=0.5):
        self.transforms, self.p = list(transforms), p

    def __call__(self, img):
        if _random.random() < self.p:
            for t in self.transforms:
                img = t(img)
        return img


def _f_get_dimensions(img):
    if isinstance(img, Image.Image):
        return [len(img.getbands()), img.size[1], img.size[0]]
    return [img.shape[0], img.shape[1], img.shape[2]]


def _f_resize(img, size, interpolation=_InterpolationMode.BILINEAR, **kw):
    return _resize_shortest(img, size, interpolation)


def _f_crop(img, top, left, height, width):
    return img.crop((left, top, left + width, top + height))


def _f_pad(img, padding, fill=0, padding_mode="constant"):
    l, t, r, b = padding
    w, h = img.size
    out = Image.new(img.mode, (w + l + r, h + t + b),
                    (fill, fill, fill) if img.mode == "RGB" else fill)
    out.paste(img, (l, t))
    return out


def install_torchvision():
    tv = _module("torchvision")
    transforms = _module("torchvision.transforms")
    for name, cls in [
        ("Compose", _Compose), ("Resize", _Resize), ("CenterCrop", _CenterCrop),
        ("RandomResizedCrop", _RandomResizedCrop), ("ToTensor", _ToTensor),
        ("Normalize", _Normalize), ("InterpolationMode", _InterpolationMode),
        ("ColorJitter", _ColorJitter), ("Grayscale", _Grayscale),
        ("GaussianBlur", _GaussianBlur), ("RandomApply", _RandomApply),
    ]:
        setattr(transforms, name, cls)
    tv.transforms = transforms

    functional = _module("torchvision.transforms.functional")
    functional.get_dimensions = _f_get_dimensions
    functional.resize = _f_resize
    functional.crop = _f_crop
    functional.pad = _f_pad
    functional.to_tensor = lambda img: _ToTensor()(img)
    functional.normalize = lambda t, mean, std, inplace=False: _Normalize(mean, std)(t)
    transforms.functional = functional

    datasets = _module("torchvision.datasets")

    class _Unavailable:
        def __init__(self, *a, **k):
            raise RuntimeError("torchvision.datasets stub: not available")

    datasets.ImageFolder = _Unavailable
    datasets.CIFAR10 = _Unavailable
    datasets.CIFAR100 = _Unavailable
    tv.datasets = datasets

    ops = _module("torchvision.ops")
    misc = _module("torchvision.ops.misc")
    import torch.nn as nn

    misc.FrozenBatchNorm2d = nn.BatchNorm2d
    ops.misc = misc
    tv.ops = ops
    return tv


def install_all():
    """Inject every stub the reference's training.main needs; idempotent.

    Replaces ref_oracle's inert torchvision stub if that was installed first
    (marker attribute ``__latteclip_functional__`` distinguishes them).
    """
    if not getattr(sys.modules.get("webdataset"), "__latteclip_functional__", False):
        for name in [m for m in list(sys.modules)
                     if m == "webdataset" or m.startswith("webdataset.")]:
            del sys.modules[name]
        install_webdataset().__latteclip_functional__ = True
    if not getattr(sys.modules.get("torchvision"), "__latteclip_functional__", False):
        replaced_tv = "torchvision" in sys.modules
        for name in [m for m in list(sys.modules)
                     if m == "torchvision" or m.startswith("torchvision.")]:
            del sys.modules[name]
        install_torchvision().__latteclip_functional__ = True
        if replaced_tv:
            # reference modules imported against ref_oracle's inert stub hold
            # stale `from torchvision.transforms import Compose` bindings
            # (non-callable dummies) — purge them so they re-import against
            # the functional stub (suite-order independence)
            from ref_oracle import REF_ROOT

            for name, mod in list(sys.modules.items()):
                f = getattr(mod, "__file__", None)
                if f and f.startswith(REF_ROOT):
                    del sys.modules[name]
    if "braceexpand" not in sys.modules:
        be = _module("braceexpand")
        be.braceexpand = lambda p: iter(braceexpand(p))
    if "ftfy" not in sys.modules:
        ftfy = _module("ftfy")
        ftfy.fix_text = lambda s: s
    # torch >= 2.6 defaults weights_only=True; the reference's own
    # checkpoints carry numpy scalars in the optimizer state
    try:
        import torch

        torch.serialization.add_safe_globals(
            [np.core.multiarray.scalar, np.dtype, np.dtypes.Float64DType]
        )
    except Exception:  # pragma: no cover
        pass
