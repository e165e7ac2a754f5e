"""TensorBoard event-writer round-trip (obs/tensorboard.py).

The writer targets byte-level TFRecord/Event compatibility (reference
main.py:434-457 uses torch.utils.tensorboard); the reader half of the
module re-parses frames with crc checks, so a green round-trip validates
the framing, the masking, and the proto layout.
"""
import struct

import pytest

from latteclip_tpu.obs.tensorboard import (
    SummaryWriter,
    crc32c,
    decode_scalar_event,
    make_writers,
    masked_crc32c,
    read_records,
)


def test_crc32c_known_vectors():
    # RFC 3720 appendix test vectors for CRC32C (Castagnoli)
    assert crc32c(b"") == 0x0
    assert crc32c(b"123456789") == 0xE3069283
    assert crc32c(bytes(32)) == 0x8A9136AA


def test_masked_crc_matches_tensorflow_formula():
    c = crc32c(b"123456789")
    assert masked_crc32c(b"123456789") == (((c >> 15) | (c << 17)) + 0xA282EAD8) & 0xFFFFFFFF


def test_writer_roundtrip(tmp_path):
    w = SummaryWriter(str(tmp_path))
    w.add_scalar("train/loss", 1.5, 10)
    w.add_scalar("val/top1", 0.25, 2)
    w.close()

    records = read_records(w.path)
    assert len(records) == 3
    header = decode_scalar_event(records[0])
    assert header["file_version"] == "brain.Event:2"

    ev1 = decode_scalar_event(records[1])
    assert ev1["tag"] == "train/loss"
    assert ev1["simple_value"] == pytest.approx(1.5)
    assert ev1["step"] == 10
    assert ev1["wall_time"] > 1e9

    ev2 = decode_scalar_event(records[2])
    assert (ev2["tag"], ev2["step"]) == ("val/top1", 2)
    assert ev2["simple_value"] == pytest.approx(0.25)


def test_corrupt_record_detected(tmp_path):
    w = SummaryWriter(str(tmp_path))
    w.add_scalar("a", 1.0, 1)
    w.close()
    data = bytearray(open(w.path, "rb").read())
    data[-6] ^= 0xFF  # flip a payload byte of the last record
    open(w.path, "wb").write(bytes(data))
    with pytest.raises(ValueError):
        read_records(w.path)


def test_make_writers_dispatch(tmp_path):
    assert make_writers("", str(tmp_path), "run", True) == []
    assert make_writers("tensorboard", str(tmp_path), "run", False) == []
    ws = make_writers("tensorboard", str(tmp_path), "run", True)
    assert len(ws) == 1 and "run/tensorboard" in ws[0].path.replace("\\", "/")
    ws[0].close()
    with pytest.raises(ImportError):
        make_writers("wandb", str(tmp_path), "run", True)
    with pytest.raises(ValueError):
        make_writers("nope", str(tmp_path), "run", True)


def test_wandb_writer_with_stub_module(tmp_path, monkeypatch):
    """wandb is absent in this environment, so the writer is driven through
    an injected stub module asserting the reference's API usage
    (main.py:444-453 init kwargs; train.py:626-629 one log dict per step)."""
    import sys
    import types

    calls = {"log": [], "finish": 0}

    stub = types.ModuleType("wandb")

    def init(**kw):
        calls["init"] = kw

    stub.init = init
    stub.log = lambda data, step=None: calls["log"].append((step, dict(data)))
    stub.finish = lambda: calls.__setitem__("finish", calls["finish"] + 1)
    monkeypatch.setitem(sys.modules, "wandb", stub)

    ws = make_writers(
        "wandb", str(tmp_path), "myrun", True,
        wandb_project="proj-x", wandb_notes="n", wandb_resume="auto",
        config={"lr": 1e-5},
    )
    assert len(ws) == 1
    assert calls["init"] == {
        "project": "proj-x", "name": "myrun", "id": "myrun", "notes": "n",
        "tags": [], "resume": "auto", "config": {"lr": 1e-5},
    }
    w = ws[0]
    w.add_scalar("train/loss", 1.5, 3)
    w.add_scalar("train/lr", 0.1, 3)
    w.add_scalar("train/loss", 1.2, 4)
    w.flush()
    assert calls["log"] == [
        (3, {"train/loss": 1.5, "train/lr": 0.1}),
        (4, {"train/loss": 1.2}),
    ]
    w.add_scalar("val/top1", 0.9, 5)
    w.close()
    assert calls["log"][-1] == (5, {"val/top1": 0.9})
    assert calls["finish"] == 1

    # non-master stays writer-free; absent module still raises like the
    # reference's assert
    assert make_writers("wandb", str(tmp_path), "r", False) == []
    monkeypatch.delitem(sys.modules, "wandb")
    import builtins

    real_import = builtins.__import__

    def no_wandb(name, *a, **k):
        if name == "wandb":
            raise ImportError("nope")
        return real_import(name, *a, **k)

    monkeypatch.setattr(builtins, "__import__", no_wandb)
    with pytest.raises(ImportError):
        make_writers("wandb", str(tmp_path), "r", True)
