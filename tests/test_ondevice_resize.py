"""On-device RandomResizedCrop path (--ondevice-resize).

The host ships decoded uint8 canvases + torchvision-sampled crop boxes; the
batched antialiased bicubic crop+resize runs on device
(``transforms.device_random_resized_crop``). Because the box rng consumption
order matches the host path exactly, fixture images (64 px ≤ canvas) produce
IDENTICAL boxes — the only difference is the resampler, tested against PIL.
"""
import os

import numpy as np
import pytest
import jax.numpy as jnp
from PIL import Image

from latteclip_tpu.data import transforms as T
from latteclip_tpu.data.pipeline import PipelineConfig, TrainPipeline, build_train_data
from latteclip_tpu.data.synthetic import DEFAULT_CLASSES, make_full_fixture
from latteclip_tpu.models.tokenizer import get_tokenizer


@pytest.fixture(scope="module")
def fixture_root(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("odr_fixture"))
    make_full_fixture(root, num_train=16, num_val=4, image_size=64)
    return root


def _pipe(fixture_root, **kw):
    tok = get_tokenizer()
    class_names = [c.lower().replace("_", " ") for c in DEFAULT_CLASSES]
    data = build_train_data(
        os.path.join(fixture_root, "webdataset", "train_tars"),
        os.path.join(fixture_root, "clip_features_train.pkl"),
        [os.path.join(fixture_root, "captions_per_image")],
        [os.path.join(fixture_root, "captions_per_group")],
        class_names,
        tok,
    )
    return TrainPipeline(data, PipelineConfig(batch_size=8, image_size=48, num_threads=2, **kw), num_samples=16)


def test_device_crop_matches_pil():
    # smooth content isolates the resampler from antialias-tail differences
    yy, xx = np.mgrid[0:96, 0:96].astype(np.float32)
    smooth = np.stack(
        [np.sin(xx / 9.0) * 120 + 127, np.cos(yy / 7.0) * 120 + 127, (xx + yy) * 1.2],
        axis=-1,
    ).astype(np.uint8)
    noisy = np.random.default_rng(0).integers(0, 255, (96, 96, 3)).astype(np.uint8)
    imgs = np.stack([smooth, smooth, noisy])
    boxes = np.asarray([[5, 9, 70, 60], [0, 0, 96, 96], [20, 10, 40, 80]], np.float32)

    ours = np.asarray(T.device_random_resized_crop(jnp.asarray(imgs), jnp.asarray(boxes), 48))
    for i, (l, t, w, h) in enumerate(boxes.astype(int)):
        want = np.asarray(
            Image.fromarray(imgs[i]).resize((48, 48), Image.BICUBIC, box=(l, t, l + w, t + h)),
            np.float32,
        )
        d = np.abs(ours[i] - want)
        if i < 2:
            assert d.max() < 2.5  # smooth: < 1% of the 255 range pointwise
        else:
            # noisy content: antialias filter-support differences show up at
            # isolated pixels; the aggregate error stays sub-LSB
            assert d.mean() < 1.0


def test_pipeline_emits_canvases_and_boxes(fixture_root):
    pipe = _pipe(fixture_root, ondevice_resize=True, canvas_size=96)
    b = next(iter(pipe.epoch(0)))
    assert b["images"].shape == (8, 96, 96, 3) and b["images"].dtype == np.uint8
    assert b["crop_boxes"].shape == (8, 4) and b["crop_boxes"].dtype == np.float32
    # fixture images are 64px: canvas is zero-padded beyond them
    assert (b["images"][:, 64:, :, :] == 0).all() and (b["images"][:, :, 64:, :] == 0).all()
    lefts, tops, ws, hs = b["crop_boxes"].T
    assert (ws > 0).all() and (hs > 0).all()
    assert (lefts + ws <= 64 + 1e-3).all() and (tops + hs <= 64 + 1e-3).all()


def test_ondevice_equals_host_path(fixture_root):
    host = _pipe(fixture_root, ondevice_resize=False, decode_cache_bytes=0)
    dev = _pipe(fixture_root, ondevice_resize=True, canvas_size=64)
    hb = next(iter(host.epoch(0)))
    db = next(iter(dev.epoch(0)))
    # identical rng consumption -> same samples, labels, captions
    np.testing.assert_array_equal(hb["zs_preds"], db["zs_preds"])
    np.testing.assert_array_equal(hb["per_image_tokens"], db["per_image_tokens"])
    # device crop of the canvas ≈ host PIL crop (same boxes by construction)
    cropped = np.asarray(
        T.device_random_resized_crop(jnp.asarray(db["images"]), jnp.asarray(db["crop_boxes"]), 48)
    )
    diff = np.abs(cropped - hb["images"].astype(np.float32))
    assert diff.max() < 4.0 and diff.mean() < 0.5


def test_step_consumes_boxes(fixture_root):
    import jax

    x = np.random.default_rng(0).integers(0, 255, (4, 32, 32, 3)).astype(np.uint8)
    boxes = np.asarray([[0, 0, 32, 32]] * 4, np.float32)
    out = T.train_augment_normalize(
        jnp.asarray(x), jax.random.PRNGKey(0), boxes=jnp.asarray(boxes), size=24
    )
    assert out.shape == (4, 24, 24, 3) and out.dtype == jnp.float32
