import numpy as np
import pytest

from latteclip_tpu.core.pt_io import load_pt, save_pt

torch = pytest.importorskip("torch")


def _sample_obj():
    rng = np.random.RandomState(0)
    return {
        "epoch": 7,
        "name": "run",
        "state_dict": {
            "w": rng.randn(4, 5).astype(np.float32),
            "b": np.arange(7, dtype=np.int64),
            "h": rng.randn(3).astype(np.float16),
            "scalar": np.float32(2.5),
        },
    }


def test_roundtrip_self(tmp_path):
    p = str(tmp_path / "x.pt")
    obj = _sample_obj()
    save_pt(obj, p)
    back = load_pt(p)
    assert back["epoch"] == 7 and back["name"] == "run"
    for k in ("w", "b", "h"):
        np.testing.assert_array_equal(back["state_dict"][k], obj["state_dict"][k])


def test_torch_reads_ours(tmp_path):
    p = str(tmp_path / "x.pt")
    obj = _sample_obj()
    save_pt(obj, p)
    t = torch.load(p, map_location="cpu", weights_only=False)
    assert torch.allclose(t["state_dict"]["w"], torch.from_numpy(obj["state_dict"]["w"]))
    assert t["state_dict"]["b"].dtype == torch.int64
    assert t["epoch"] == 7


def test_torch_weights_only_reads_ours(tmp_path):
    """The stream must reference ONLY torch-allowlisted globals — a stock
    OpenCLIP user on torch >= 2.6 loads with the weights_only=True default
    and must not need latteclip_tpu importable (round-3 writer fix)."""
    p = str(tmp_path / "x.pt")
    obj = _sample_obj()
    obj["state_dict"]["logit_scale"] = np.asarray(4.6052, np.float32).reshape(())
    obj["tags"] = ["a", "b"]
    obj["flags"] = (True, False, None)
    save_pt(obj, p)
    t = torch.load(p, map_location="cpu", weights_only=True)
    assert t["state_dict"]["logit_scale"].shape == ()  # 0-d preserved
    for k in ("w", "b", "h"):
        np.testing.assert_array_equal(
            t["state_dict"][k].numpy(), obj["state_dict"][k])
    assert t["tags"] == ["a", "b"] and tuple(t["flags"]) == (True, False, None)


def test_legacy_shim_files_still_load(tmp_path):
    """Files written by the pre-round-3 writer pickled shim globals from this
    module (_find_global/_apply_rebuild); load_pt must keep reading them."""
    import io as _io
    import pickle
    import zipfile

    from latteclip_tpu.core import pt_io

    arr = np.arange(6, dtype=np.float32).reshape(2, 3)

    class LegacyProxy:
        def __reduce__(self):
            return (
                pt_io._apply_rebuild,
                (torch._utils._rebuild_tensor_v2, Storage(), 0, (2, 3), (3, 1)),
            )

    class Storage:
        pass

    class LegacyPickler(pickle.Pickler):
        def persistent_id(self, o):
            if isinstance(o, Storage):
                return ("storage", "FloatStorage", "0", "cpu", 6)
            return None

    buf = _io.BytesIO()
    LegacyPickler(buf, protocol=2).dump({"w": LegacyProxy()})
    p = str(tmp_path / "legacy.pt")
    with zipfile.ZipFile(p, "w") as zf:
        zf.writestr("archive/data.pkl", buf.getvalue())
        zf.writestr("archive/data/0", arr.tobytes())
    back = load_pt(p)
    np.testing.assert_array_equal(back["w"], arr)


def test_we_read_torch(tmp_path):
    p = str(tmp_path / "y.pt")
    torch.save(
        {
            "a": torch.randn(2, 3),
            "nested": {"x": torch.arange(5)},
            "s": "hi",
            "pi": 3.14,
            "bf": torch.randn(4, dtype=torch.bfloat16),
            "noncontig": torch.randn(4, 6).t(),
        },
        p,
    )
    ours = load_pt(p)
    theirs = torch.load(p, weights_only=False)
    np.testing.assert_allclose(ours["a"], theirs["a"].numpy())
    np.testing.assert_allclose(ours["bf"], theirs["bf"].float().numpy())
    np.testing.assert_allclose(ours["noncontig"], theirs["noncontig"].numpy())
    np.testing.assert_array_equal(ours["nested"]["x"], np.arange(5))
    assert ours["s"] == "hi" and ours["pi"] == 3.14
