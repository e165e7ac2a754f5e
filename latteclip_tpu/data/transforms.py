"""Image preprocessing: host-side geometry, device-side fused pixel math.

The reference runs the whole torchvision pipeline per-sample on CPU workers
(reference ``src/open_clip/transform.py:348-408``). Here only the
shape-changing steps (decode, resize, crop) run on host — they are
variable-shape and PIL-exact for eval parity — while every element-wise step
(to-float, color jitter, grayscale, normalize) is a single jit-compiled
batched function on device, fed with uint8 batches (4× less host→HBM
traffic than f32).

Eval geometry matches the reference exactly: resize shortest edge (bicubic)
+ center crop (``transform.py:390-401``). Train geometry matches
``RandomResizedCrop(scale=(0.9,1.0))`` semantics (``transform.py:348-355``),
including torchvision's 10-attempt area/log-aspect sampling. Train color
augmentation reproduces the forced LatteCLIP recipe — color-jitter
(0.5,0.5,0.5,0.1) @ p=0.8 and grayscale @ p=0.2 (reference
``src/training/main.py:233-235``) — with one documented deviation: jitter
sub-ops apply in fixed order (brightness, contrast, saturation, hue) rather
than a random permutation; the sampled factors match torchvision's
distributions.
"""
from __future__ import annotations

import dataclasses
import math
from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from PIL import Image

OPENAI_MEAN = (0.48145466, 0.4578275, 0.40821073)
OPENAI_STD = (0.26862954, 0.26130258, 0.27577711)


def model_mean_std(cfg) -> Tuple[Tuple[float, ...], Tuple[float, ...]]:
    """Per-model normalization stats (reference PreprocessCfg): the model
    config's image_mean/image_std when set, else the OpenAI CLIP defaults."""
    mean = getattr(cfg, "image_mean", None) or OPENAI_MEAN
    std = getattr(cfg, "image_std", None) or OPENAI_STD
    return tuple(mean), tuple(std)

# ITU-R 601-2 luma weights (torchvision rgb_to_grayscale)
_LUMA = (0.2989, 0.587, 0.114)


@dataclasses.dataclass(frozen=True)
class AugConfig:
    """LatteCLIP's forced train augmentation (reference main.py:233-235)."""

    scale_min: float = 0.9
    scale_max: float = 1.0
    color_jitter: Tuple[float, float, float, float] = (0.5, 0.5, 0.5, 0.1)
    color_jitter_prob: float = 0.8
    gray_scale_prob: float = 0.2


# ---------------------------------------------------------------------------
# Host-side geometry (PIL; exact torchvision-PIL parity)
# ---------------------------------------------------------------------------

def eval_resize_crop(img: Image.Image, size: int, resize_mode: str = "shortest") -> np.ndarray:
    """Eval geometry -> uint8 [size, size, 3] (reference transform.py:378-401
    + the v2 modes, transform.py:411-425):

    * ``shortest`` (CLIP default): resize shortest edge to ``size``
      (bicubic) + center crop;
    * ``squash`` (SigLIP): resize both edges to ``size`` (aspect distorts);
    * ``longest`` (CenterCropOrPad): resize longest edge to ``size``, pad
      the other to square with black.
    """
    w, h = img.size
    if resize_mode == "squash":
        img = img.resize((size, size), Image.BICUBIC)
        return np.asarray(img, dtype=np.uint8)
    if resize_mode == "longest":
        scale = size / max(w, h)
        new_w, new_h = max(1, round(w * scale)), max(1, round(h * scale))
        img = img.resize((new_w, new_h), Image.BICUBIC)
        canvas = np.zeros((size, size, 3), np.uint8)
        top, left = (size - new_h) // 2, (size - new_w) // 2
        canvas[top:top + new_h, left:left + new_w] = np.asarray(img, dtype=np.uint8)
        return canvas
    if resize_mode != "shortest":
        raise ValueError(f"unknown resize_mode: {resize_mode}")
    # torchvision _compute_resized_output_size TRUNCATES the long edge
    # (int(), not round()) — required for byte-exact eval parity
    if w <= h:
        new_w, new_h = size, max(size, int(size * h / w))
    else:
        new_w, new_h = max(size, int(size * w / h)), size
    img = img.resize((new_w, new_h), Image.BICUBIC)
    left = int(round((new_w - size) / 2.0))
    top = int(round((new_h - size) / 2.0))
    img = img.crop((left, top, left + size, top + size))
    return np.asarray(img, dtype=np.uint8)


def random_crop_box(
    w: int,
    h: int,
    rng: np.random.Generator,
    scale: Tuple[float, float] = (0.9, 1.0),
    ratio: Tuple[float, float] = (3.0 / 4.0, 4.0 / 3.0),
) -> Tuple[int, int, int, int]:
    """torchvision RandomResizedCrop box sampling -> (left, top, cw, ch)."""
    area = w * h
    log_ratio = (math.log(ratio[0]), math.log(ratio[1]))
    for _ in range(10):
        target_area = area * rng.uniform(scale[0], scale[1])
        aspect = math.exp(rng.uniform(*log_ratio))
        cw = int(round(math.sqrt(target_area * aspect)))
        ch = int(round(math.sqrt(target_area / aspect)))
        if 0 < cw <= w and 0 < ch <= h:
            left = int(rng.integers(0, w - cw + 1))
            top = int(rng.integers(0, h - ch + 1))
            return left, top, cw, ch
    # fallback: center crop at clamped aspect (torchvision fallback path)
    in_ratio = w / h
    if in_ratio < ratio[0]:
        cw, ch = w, int(round(w / ratio[0]))
    elif in_ratio > ratio[1]:
        cw, ch = int(round(h * ratio[1])), h
    else:
        cw, ch = w, h
    return (w - cw) // 2, (h - ch) // 2, cw, ch


def random_resized_crop(
    img: Image.Image,
    size: int,
    rng: np.random.Generator,
    scale: Tuple[float, float] = (0.9, 1.0),
    ratio: Tuple[float, float] = (3.0 / 4.0, 4.0 / 3.0),
) -> np.ndarray:
    """torchvision RandomResizedCrop semantics -> uint8 [size, size, 3]."""
    w, h = img.size
    left, top, cw, ch = random_crop_box(w, h, rng, scale, ratio)
    img = img.resize((size, size), Image.BICUBIC, box=(left, top, left + cw, top + ch))
    return np.asarray(img, dtype=np.uint8)


def load_rgb(path_or_file) -> Image.Image:
    img = Image.open(path_or_file)
    return img.convert("RGB") if img.mode != "RGB" else img


# ---------------------------------------------------------------------------
# Device-side fused pixel math (jit; batched)
# ---------------------------------------------------------------------------

def _grayscale(x: jnp.ndarray) -> jnp.ndarray:
    g = x[..., 0] * _LUMA[0] + x[..., 1] * _LUMA[1] + x[..., 2] * _LUMA[2]
    return g[..., None]


def _rgb_to_hsv(x: jnp.ndarray):
    r, g, b = x[..., 0], x[..., 1], x[..., 2]
    maxc = jnp.max(x, axis=-1)
    minc = jnp.min(x, axis=-1)
    v = maxc
    delta = maxc - minc
    s = jnp.where(maxc > 0, delta / jnp.maximum(maxc, 1e-8), 0.0)
    safe_delta = jnp.maximum(delta, 1e-8)
    rc = (maxc - r) / safe_delta
    gc = (maxc - g) / safe_delta
    bc = (maxc - b) / safe_delta
    h = jnp.where(maxc == r, bc - gc, jnp.where(maxc == g, 2.0 + rc - bc, 4.0 + gc - rc))
    h = jnp.where(delta > 0, (h / 6.0) % 1.0, 0.0)
    return h, s, v


def _hsv_to_rgb(h: jnp.ndarray, s: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """Arithmetic (gather-free) HSV->RGB: channel_n = v - v*s*clip(min(k, 4-k))
    with k = (n + 6h) mod 6 — pure VPU ops, no 6-way select tables."""

    def channel(n: float) -> jnp.ndarray:
        k = (n + h * 6.0) % 6.0
        return v - v * s * jnp.clip(jnp.minimum(k, 4.0 - k), 0.0, 1.0)

    return jnp.stack([channel(5.0), channel(3.0), channel(1.0)], axis=-1)


def _blend(a: jnp.ndarray, b: jnp.ndarray, factor: jnp.ndarray) -> jnp.ndarray:
    return jnp.clip(factor * a + (1.0 - factor) * b, 0.0, 1.0)


@partial(jax.jit, static_argnames=("mean", "std"))
def normalize_images(
    batch_u8: jnp.ndarray,
    mean: Tuple[float, ...] = OPENAI_MEAN,
    std: Tuple[float, ...] = OPENAI_STD,
) -> jnp.ndarray:
    """uint8 [B,H,W,3] -> normalized f32 [B,H,W,3] (eval path)."""
    x = batch_u8.astype(jnp.float32) / 255.0
    m = jnp.asarray(mean, dtype=jnp.float32)
    s = jnp.asarray(std, dtype=jnp.float32)
    return (x - m) / s


def color_augment(x: jnp.ndarray, rng: jax.Array, aug: AugConfig) -> jnp.ndarray:
    """Batched color jitter + random grayscale on f32 [B,H,W,3] in [0,1]."""
    B = x.shape[0]
    kb, kc, ks, kh, kp, kg = jax.random.split(rng, 6)
    bf, cf, sf, hf = aug.color_jitter

    def u(key, lo, hi):
        return jax.random.uniform(key, (B, 1, 1, 1), minval=lo, maxval=hi)

    jittered = x
    # brightness
    jittered = _blend(jittered, jnp.zeros_like(jittered), u(kb, max(0.0, 1 - bf), 1 + bf))
    # contrast (per-image mean of grayscale)
    mean_gray = jnp.mean(_grayscale(jittered), axis=(1, 2, 3), keepdims=True)
    jittered = _blend(jittered, jnp.broadcast_to(mean_gray, jittered.shape), u(kc, max(0.0, 1 - cf), 1 + cf))
    # saturation
    gray3 = jnp.broadcast_to(_grayscale(jittered), jittered.shape)
    jittered = _blend(jittered, gray3, u(ks, max(0.0, 1 - sf), 1 + sf))
    # hue
    h, s, v = _rgb_to_hsv(jittered)
    h = (h + jax.random.uniform(kh, (B, 1, 1), minval=-hf, maxval=hf)) % 1.0
    jittered = jnp.clip(_hsv_to_rgb(h, s, v), 0.0, 1.0)

    apply_jitter = jax.random.uniform(kp, (B, 1, 1, 1)) < aug.color_jitter_prob
    x = jnp.where(apply_jitter, jittered, x)

    apply_gray = jax.random.uniform(kg, (B, 1, 1, 1)) < aug.gray_scale_prob
    x = jnp.where(apply_gray, jnp.broadcast_to(_grayscale(x), x.shape), x)
    return x


def device_random_resized_crop(
    batch_u8: jnp.ndarray, boxes: jnp.ndarray, size: int
) -> jnp.ndarray:
    """Batched crop+resize on device: uint8 canvases [B, CV, CV, 3] + boxes
    [B, 4] (left, top, cw, ch in canvas pixels) -> f32 [B, size, size, 3] in
    [0, 255].

    Separable antialiased Keys-cubic resampling via per-sample
    ``jax.image.scale_and_translate`` (vmapped) — measured ≤ 1/255 max
    deviation from PIL's bicubic ``resize(box=...)`` on smooth images. This
    replaces the host-side PIL resize that bottlenecks the full training
    loop on few-core hosts (BASELINE.md: 273 img/s host-bound); the weight
    build + two batched matmuls run on the MXU inside the train step.
    """
    boxes = boxes.astype(jnp.float32)

    def one(img, box):
        left, top, cw, ch = box[0], box[1], box[2], box[3]
        scale = jnp.stack([size / ch, size / cw])
        translation = jnp.stack([-top * size / ch, -left * size / cw])
        return jax.image.scale_and_translate(
            img.astype(jnp.float32), (size, size, 3), (0, 1),
            scale, translation, method="cubic", antialias=True,
        )

    return jax.vmap(one)(batch_u8, boxes)


def train_augment_normalize(
    batch_u8: jnp.ndarray,
    rng: jax.Array,
    aug: AugConfig = AugConfig(),
    mean: Tuple[float, ...] = OPENAI_MEAN,
    std: Tuple[float, ...] = OPENAI_STD,
    boxes: jnp.ndarray = None,
    size: int = 224,
) -> jnp.ndarray:
    """uint8 [B,H,W,3] -> augmented + normalized f32 (train path).

    Designed to be called *inside* the jitted train step so XLA fuses it with
    the patchify matmul. With ``boxes`` the geometry (RandomResizedCrop) also
    runs on device over padded canvases (see ``device_random_resized_crop``).
    """
    if boxes is not None:
        x = jnp.clip(device_random_resized_crop(batch_u8, boxes, size), 0.0, 255.0) / 255.0
    else:
        x = batch_u8.astype(jnp.float32) / 255.0
    x = color_augment(x, rng, aug)
    m = jnp.asarray(mean, dtype=jnp.float32)
    s = jnp.asarray(std, dtype=jnp.float32)
    return (x - m) / s
