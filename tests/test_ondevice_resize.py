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
    # fixture images are 64px: the canvas beyond them is edge-replicated
    # (NOT zeros — zero padding darkens crop borders, see
    # test_nonsquare_edge_replication)
    np.testing.assert_array_equal(
        b["images"][:, 64:, :64, :], np.broadcast_to(b["images"][:, 63:64, :64, :], (8, 32, 64, 3))
    )
    np.testing.assert_array_equal(
        b["images"][:, :64, 64:, :], np.broadcast_to(b["images"][:, :64, 63:64, :], (8, 64, 32, 3))
    )
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


def test_nonsquare_edge_replication():
    """Non-square images must not sample canvas padding at crop edges: the
    pipeline edge-replicates content into the padding, so a constant image
    stays constant through the device crop (was ~4% dark on the last row
    with zero padding)."""
    import io
    import jax.numpy as jnp

    from latteclip_tpu.data.pipeline import PipelineConfig, TrainPipeline, LatteCLIPTrainData

    w, h, CV, size = 120, 80, 96, 64
    img = Image.fromarray(np.full((h, w, 3), 128, np.uint8))
    buf = io.BytesIO()
    img.save(buf, format="JPEG", quality=95)

    data = LatteCLIPTrainData(
        shards=[], class_names=["a"], zs_top1={"x": 0},
        per_image_tokens=[], group_tokens={}, class_to_image_ids={0: ["x"]},
        gt_label={},
    )
    pipe = TrainPipeline(
        data, PipelineConfig(batch_size=1, image_size=size, ondevice_resize=True,
                             canvas_size=CV), num_samples=1,
    )
    raw = {"__key__": "x", "jpg": buf.getvalue()}
    s = pipe._assemble_ondevice(raw, "x", raw["jpg"], np.random.default_rng(0))
    canvas = s["image"]
    # padding regions are edge replicas, not zeros
    assert canvas.shape == (CV, CV, 3)
    assert (canvas[70:] > 100).all() and (canvas[:, 90:] > 100).all()

    out = np.asarray(T.device_random_resized_crop(
        jnp.asarray(canvas[None]), jnp.asarray(s["crop_box"][None]), size
    ))[0]
    # JPEG round-trip of a constant image stays within 1 LSB everywhere,
    # including the last rows/cols that read past the content edge
    assert np.abs(out - 128.0).max() < 2.0


def test_eval_resize_modes():
    """resize_mode variants (reference transform.py v2 modes: SigLIP squash,
    CenterCropOrPad longest)."""
    img = Image.fromarray(
        np.random.default_rng(0).integers(0, 255, (40, 80, 3)).astype(np.uint8)
    )
    shortest = T.eval_resize_crop(img, 32, "shortest")
    squash = T.eval_resize_crop(img, 32, "squash")
    longest = T.eval_resize_crop(img, 32, "longest")
    assert shortest.shape == squash.shape == longest.shape == (32, 32, 3)
    # squash equals a direct PIL both-edge resize
    np.testing.assert_array_equal(
        squash, np.asarray(img.resize((32, 32), Image.BICUBIC))
    )
    # longest: 80->32 wide, 40->16 tall, vertically centered with padding
    assert (longest[:8] == 0).all() and (longest[24:] == 0).all()
    assert longest[8:24].any()
    import pytest as _pytest

    with _pytest.raises(ValueError):
        T.eval_resize_crop(img, 32, "nope")
