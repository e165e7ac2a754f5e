"""Tar reader + train pipeline tests on the synthetic fixture."""
import os

import numpy as np
import pytest

from latteclip_tpu.data.pipeline import (
    PipelineConfig,
    TrainPipeline,
    build_train_data,
    load_caption_tokens,
    prefetch,
)
from latteclip_tpu.data.synthetic import DEFAULT_CLASSES, make_full_fixture
from latteclip_tpu.data.tar_reader import (
    ShuffleBuffer,
    expand_shard_pattern,
    iter_tar_samples,
    shuffled_shards,
    split_shards,
)
from latteclip_tpu.models.tokenizer import get_tokenizer


@pytest.fixture(scope="module")
def fixture_root(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("train_fixture"))
    make_full_fixture(root, num_train=24, num_val=8, image_size=64)
    return root


def test_expand_shard_pattern():
    assert expand_shard_pattern("/x/{00000..00003}.tar") == [
        f"/x/{i:05d}.tar" for i in range(4)
    ]
    assert expand_shard_pattern("/x/a.tar") == ["/x/a.tar"]
    assert expand_shard_pattern("/x/a.tar::/x/b.tar") == ["/x/a.tar", "/x/b.tar"]


def test_expand_shard_dir(fixture_root):
    tar_dir = os.path.join(fixture_root, "webdataset", "train_tars")
    shards = expand_shard_pattern(tar_dir)
    assert len(shards) == 1 and shards[0].endswith("00000.tar")


def test_iter_tar_samples(fixture_root):
    tar_dir = os.path.join(fixture_root, "webdataset", "train_tars")
    shards = expand_shard_pattern(tar_dir)
    samples = list(iter_tar_samples(shards[0]))
    assert len(samples) == 24
    s = samples[0]
    assert {"__key__", "jpg", "txt", "json"} <= set(s)
    assert isinstance(s["jpg"], bytes)


def test_shard_shuffle_deterministic():
    shards = [f"s{i}" for i in range(10)]
    a = shuffled_shards(shards, seed=1, epoch=0)
    b = shuffled_shards(shards, seed=1, epoch=0)
    c = shuffled_shards(shards, seed=1, epoch=1)
    assert a == b and a != c and sorted(c) == sorted(shards)
    assert split_shards(shards, 1, 4) == shards[1::4]


def test_shuffle_buffer_is_permutation():
    buf = ShuffleBuffer(bufsize=8, seed=0)
    out = list(buf(iter(range(50))))
    assert sorted(out) == list(range(50)) and out != list(range(50))


def test_load_caption_tokens(fixture_root):
    tok = get_tokenizer()
    d = load_caption_tokens(os.path.join(fixture_root, "captions_per_image"), tok)
    assert len(d) == 24
    arr = next(iter(d.values()))
    assert arr.shape == (77,) and arr[0] == tok.sot_token_id


def test_train_pipeline_batches(fixture_root):
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
    pipe = TrainPipeline(data, PipelineConfig(batch_size=8, image_size=64, num_threads=2), num_samples=24)
    assert pipe.steps_per_epoch == 3
    batches = list(prefetch(pipe.epoch(0)))
    assert len(batches) == 3
    b = batches[0]
    assert b["images"].shape == (8, 64, 64, 3) and b["images"].dtype == np.uint8
    assert b["per_image_tokens"].shape == (8, 77)
    assert b["per_group_tokens"].shape == (8, 77)
    assert b["zs_preds"].shape == (8,) and b["zs_preds"].max() < len(class_names)
    assert (b["gt_labels"] >= 0).all()

    # group caption donor must share the pseudo-class: verify via decode
    row = 0
    decoded = tok.decode([t for t in b["per_group_tokens"][row] if t not in (0, tok.sot_token_id, tok.eot_token_id)])
    pseudo_cls = class_names[b["zs_preds"][row]]
    assert pseudo_cls in decoded

    # epochs differ (augmentation + shuffling), same epoch is reproducible
    again = list(pipe.epoch(0))
    assert np.array_equal(batches[0]["zs_preds"], again[0]["zs_preds"])
    other = next(iter(pipe.epoch(1)))
    assert not np.array_equal(batches[0]["images"], other["images"])


def test_steps_per_epoch_ceil(fixture_root):
    """Reference rounds steps/epoch UP (data.py:727-729, floor=False default):
    DTD 3,948 samples at global batch 512 -> 8 steps, not 7."""
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
    pipe = TrainPipeline(data, PipelineConfig(batch_size=512), num_samples=3948)
    assert pipe.steps_per_epoch == 8
    floored = TrainPipeline(
        data, PipelineConfig(batch_size=512, floor=True), num_samples=3948
    )
    assert floored.steps_per_epoch == 7
    # partial last batch actually streams full-shaped (wraparound fill)
    small = TrainPipeline(
        data,
        PipelineConfig(batch_size=10, image_size=64, num_threads=2),
        num_samples=24,
    )
    assert small.steps_per_epoch == 3
    batches = list(small.epoch(0))
    assert len(batches) == 3 and all(b["images"].shape[0] == 10 for b in batches)


def test_decode_cache_speeds_epochs(fixture_root):
    tok = get_tokenizer()
    class_names = [c.lower().replace("_", " ") for c in DEFAULT_CLASSES]
    data = build_train_data(
        os.path.join(fixture_root, "webdataset", "train_tars"),
        os.path.join(fixture_root, "clip_features_train.pkl"),
        [os.path.join(fixture_root, "captions_per_image")],
        [os.path.join(fixture_root, "captions_per_group")],
        class_names, tok,
    )
    pipe = TrainPipeline(data, PipelineConfig(batch_size=8, image_size=64, num_threads=2), num_samples=24)
    first = list(pipe.epoch(0))
    assert len(pipe._decode_cache) == 24  # all train images cached
    second = list(pipe.epoch(0))  # same epoch -> deterministic equality holds
    assert np.array_equal(first[0]["images"], second[0]["images"])

    # cap of 0 disables caching
    pipe2 = TrainPipeline(data, PipelineConfig(batch_size=8, image_size=64, num_threads=2, decode_cache_bytes=0), num_samples=24)
    list(pipe2.epoch(0))
    assert len(pipe2._decode_cache) == 0


@pytest.mark.parametrize("ondevice", [False, True])
def test_raw_record_cache_exactness(fixture_root, ondevice):
    """Epochs >= 2 replay cached shard records instead of re-parsing tars;
    every batch must be bit-identical to the cache-off pipeline, including
    after image payloads are stripped from cached records (the decode cache
    owns the pixels by then)."""
    tok = get_tokenizer()
    class_names = [c.lower().replace("_", " ") for c in DEFAULT_CLASSES]
    data = build_train_data(
        os.path.join(fixture_root, "webdataset", "train_tars"),
        os.path.join(fixture_root, "clip_features_train.pkl"),
        [os.path.join(fixture_root, "captions_per_image")],
        [os.path.join(fixture_root, "captions_per_group")],
        class_names, tok,
    )
    kw = dict(batch_size=8, image_size=64, num_threads=2, ondevice_resize=ondevice)
    cached = TrainPipeline(data, PipelineConfig(**kw), num_samples=24)
    plain = TrainPipeline(
        data, PipelineConfig(**kw, raw_cache_bytes=0), num_samples=24)
    for epoch in range(3):
        for bc, bp in zip(cached.epoch(epoch), plain.epoch(epoch)):
            for k in bc:
                assert np.array_equal(bc[k], bp[k]), (epoch, k)
    assert len(cached._shard_cache) > 0 and len(plain._shard_cache) == 0
    # payloads stripped once decode-cached: records hold keys+json only
    for recs in cached._shard_cache.values():
        assert all("jpg" not in r and "jpeg" not in r for r in recs)
    # epoch-2 replay never opens a tar
    import latteclip_tpu.data.pipeline as P
    orig = P.iter_tar_samples
    P.iter_tar_samples = lambda path: (_ for _ in ()).throw(
        AssertionError("tar re-parsed with warm raw cache"))
    try:
        replay = list(cached.epoch(1))
    finally:
        P.iter_tar_samples = orig
    assert len(replay) == 3


def test_native_jpeg_pipeline(fixture_root):
    from latteclip_tpu.native import load_fastjpeg

    if load_fastjpeg() is None:
        pytest.skip("native toolchain unavailable")
    tok = get_tokenizer()
    class_names = [c.lower().replace("_", " ") for c in DEFAULT_CLASSES]
    data = build_train_data(
        os.path.join(fixture_root, "webdataset", "train_tars"),
        os.path.join(fixture_root, "clip_features_train.pkl"),
        [os.path.join(fixture_root, "captions_per_image")],
        [os.path.join(fixture_root, "captions_per_group")],
        class_names, tok,
    )
    pipe = TrainPipeline(
        data, PipelineConfig(batch_size=8, image_size=64, num_threads=2, use_native_jpeg=True),
        num_samples=24,
    )
    batches = list(pipe.epoch(0))
    assert len(batches) == 3
    b = batches[0]
    assert b["images"].shape == (8, 64, 64, 3) and b["images"].dtype == np.uint8
    assert b["images"].std() > 1.0  # actual image content, not zeros


def test_train_with_gt_text_replaces_caption(fixture_root):
    """--train-with-gt-text: the per-image caption stream becomes the
    tokenized lowercased gt classname (reference data.py:476-477)."""
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
    pipe = TrainPipeline(
        data,
        PipelineConfig(batch_size=8, image_size=64, num_threads=2, train_with_gt_text=True),
        num_samples=24,
    )
    b = next(iter(pipe.epoch(0)))
    gt_table = tok([c.lower() for c in class_names])
    for row in range(8):
        gt = int(b["gt_labels"][row])
        assert gt >= 0
        np.testing.assert_array_equal(b["per_image_tokens"][row], gt_table[gt])
