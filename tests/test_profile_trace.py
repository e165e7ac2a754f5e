"""--profile → jax.profiler trace capture (VERDICT r3 #5).

The reference ships a runtime tracing surface — ``--trace``/``torch.jit.trace``
(``src/open_clip/model.py:762-775``), ``--torchcompile``
(``src/training/main.py:463-465``) and the FlopCounter CLI
(``src/training/profiler.py:82-122``). The TPU-native equivalent is a
``jax.profiler`` XPlane trace of a few warm steps; these tests assert the
flag exists, the helper writes a real trace file, and the train loop emits
one end-to-end.
"""
import glob
import os

import numpy as np

import jax
import jax.numpy as jnp

from latteclip_tpu.obs.profiler import StepTraceProfiler
from latteclip_tpu.train.params import parse_args


def _xplanes(root):
    return glob.glob(os.path.join(root, "**", "*.xplane.pb"), recursive=True)


def test_profile_flags_parsed():
    args = parse_args(["--profile"])
    assert args.profile is True
    assert args.profile_start_step == 3
    assert args.profile_num_steps == 5
    args = parse_args([])
    assert args.profile is False


def test_step_trace_profiler_writes_xplane(tmp_path):
    trace_dir = str(tmp_path / "trace")
    prof = StepTraceProfiler(trace_dir, start_step=1, num_steps=2)

    f = jax.jit(lambda x: x @ x.T)
    x = jnp.ones((64, 64))
    sync = lambda: np.asarray(x)  # noqa: E731
    for i in range(5):
        prof.on_step(i, sync=sync)
        x = f(x)
    prof.close(sync=sync)
    assert _xplanes(trace_dir), f"no .xplane.pb under {trace_dir}"


def test_step_trace_profiler_short_run_closes_open_trace(tmp_path):
    # run ends before start+num steps: close() must still finalize the trace
    trace_dir = str(tmp_path / "trace")
    prof = StepTraceProfiler(trace_dir, start_step=0, num_steps=100)
    f = jax.jit(lambda x: x + 1)
    x = jnp.zeros(8)
    for i in range(2):
        prof.on_step(i)
        x = f(x)
    prof.close(sync=lambda: np.asarray(x))
    assert _xplanes(trace_dir)


def test_train_loop_emits_trace(tmp_path):
    from latteclip_tpu.core.config import config_from_dict
    from latteclip_tpu.data.pipeline import (
        PipelineConfig,
        TrainPipeline,
        build_train_data,
    )
    from latteclip_tpu.data.synthetic import DEFAULT_CLASSES, make_full_fixture
    from latteclip_tpu.models.clip import init_clip_params
    from latteclip_tpu.models.tokenizer import get_tokenizer
    from latteclip_tpu.train import loop as loop_mod
    from latteclip_tpu.train.optim import make_optimizer, make_schedule
    from latteclip_tpu.train.state import (
        build_template_table,
        create_train_state,
        init_memory_bank,
    )
    from latteclip_tpu.train.step import LatteHParams, make_train_step

    tiny = config_from_dict(
        "tiny",
        {
            "embed_dim": 32,
            "vision_cfg": {"image_size": 32, "layers": 2, "width": 64, "patch_size": 16},
            "text_cfg": {"context_length": 77, "vocab_size": 49408, "width": 64,
                         "heads": 4, "layers": 2},
        },
    )
    root = str(tmp_path / "fx")
    make_full_fixture(root, num_train=16, num_val=4, image_size=32)
    classes = [c.lower().replace("_", " ") for c in DEFAULT_CLASSES]
    tok = get_tokenizer()
    data = build_train_data(
        os.path.join(root, "webdataset", "train_tars"),
        os.path.join(root, "clip_features_train.pkl"),
        [os.path.join(root, "captions_per_image")],
        [os.path.join(root, "captions_per_group")],
        classes, tok,
    )
    pipe = TrainPipeline(
        data, PipelineConfig(batch_size=8, image_size=32, num_threads=2),
        num_samples=16,
    )
    templates = [lambda c: f"a photo of a {c}."]
    params = init_clip_params(jax.random.PRNGKey(0), tiny)
    opt = make_optimizer(make_schedule("cosine", 1e-3, warmup=1, total_steps=4))
    bank = init_memory_bank(params, tiny, tok, classes, templates)
    table = build_template_table(tok, classes, templates)
    state = create_train_state(params, opt, bank)
    step_fn = make_train_step(tiny, opt, LatteHParams(), table)

    trace_dir = str(tmp_path / "trace")
    loop_cfg = loop_mod.LoopConfig(
        epochs=1, checkpoint_dir=str(tmp_path / "ckpt"), save_frequency=0,
        zeroshot_frequency=0, profile_dir=trace_dir,
        profile_start_step=0, profile_num_steps=1,
    )
    loop_mod.train(state, step_fn, pipe, tiny, loop_cfg, classnames=classes)
    assert _xplanes(trace_dir), f"train loop produced no trace under {trace_dir}"
