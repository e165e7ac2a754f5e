"""Remote-sync subsystem (reference file_utils.py) — local backend + path
resolution; the s3 backend shells out to `aws` and is exercised for its
error path only (no aws binary in CI)."""
import os
import time

import pytest

from latteclip_tpu.obs.file_sync import (
    RemoteSync,
    pt_load_path,
    sync_dir,
    sync_dir_local,
)


def _touch(path, content=b"x"):
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "wb") as f:
        f.write(content)


def test_sync_dir_local_copies_and_skips_latest(tmp_path):
    src = str(tmp_path / "run")
    dst = str(tmp_path / "remote")
    _touch(os.path.join(src, "out.log"), b"log")
    _touch(os.path.join(src, "checkpoints", "epoch_1.pt"), b"ckpt")
    _touch(os.path.join(src, "checkpoints", "epoch_latest.pt"), b"latest")

    assert sync_dir(src, dst) is True
    assert open(os.path.join(dst, "out.log"), "rb").read() == b"log"
    assert open(os.path.join(dst, "checkpoints", "epoch_1.pt"), "rb").read() == b"ckpt"
    # the atomically-rewritten latest pointer is excluded (reference
    # file_utils.py excludes it from `aws s3 sync` for the same reason)
    assert not os.path.exists(os.path.join(dst, "checkpoints", "epoch_latest.pt"))

    # re-sync picks up newer files only
    time.sleep(0.05)
    _touch(os.path.join(src, "out.log"), b"log2")
    assert sync_dir_local(src, dst) is True
    assert open(os.path.join(dst, "out.log"), "rb").read() == b"log2"


def test_remote_sync_thread_final_sync(tmp_path):
    src = str(tmp_path / "run")
    dst = str(tmp_path / "remote")
    _touch(os.path.join(src, "results.jsonl"), b"{}")
    rs = RemoteSync(src, dst, frequency_s=3600).start()
    assert rs.final_sync() is True
    assert os.path.exists(os.path.join(dst, "results.jsonl"))


def test_pt_load_path_local_passthrough(tmp_path):
    p = str(tmp_path / "model.pt")
    _touch(p)
    assert pt_load_path(p) == p


def test_pt_load_path_s3_error_is_clear(tmp_path):
    with pytest.raises(FileNotFoundError):
        pt_load_path("s3://no-such-bucket/model.pt", cache_dir=str(tmp_path))
