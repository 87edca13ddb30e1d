"""io/util.py parity helpers (reference utils/util.py)."""

import numpy as np
import pytest

from egovlp_tpu.io.util import (
    Timer,
    inf_loop,
    memcache,
    np_loader,
    read_json,
    replace_nested_dict_item,
    write_json,
)


def test_replace_nested_dict_item():
    d = {"a": {"split": "train", "b": {"split": "train"}}, "split": "train"}
    out = replace_nested_dict_item(d, "split", "val")
    assert out["split"] == "val"
    assert out["a"]["split"] == "val"
    assert out["a"]["b"]["split"] == "val"


def test_json_roundtrip(tmp_path):
    p = tmp_path / "x.json"
    write_json({"b": 1, "a": 2}, p)
    back = read_json(p)
    assert list(back) == ["b", "a"]  # insertion order kept (OrderedDict)


def test_inf_loop_cycles_plain_iterable():
    it = inf_loop([1, 2, 3])
    assert [next(it) for _ in range(7)] == [1, 2, 3, 1, 2, 3, 1]


def test_inf_loop_advances_loader_epochs():
    class FakeLoader:
        def __init__(self):
            self.epochs = []

        def epoch(self, e):
            self.epochs.append(e)
            yield from [e * 10, e * 10 + 1]

    l = FakeLoader()
    it = inf_loop(l)
    got = [next(it) for _ in range(5)]
    assert got == [0, 1, 10, 11, 20]
    assert l.epochs == [0, 1, 2]


def test_np_loader_l2norm(tmp_path):
    p = tmp_path / "f.npy"
    x = np.asarray([[3.0, 4.0], [0.0, 0.0]])
    np.save(p, x)
    out = np_loader(str(p), l2norm=True)
    np.testing.assert_allclose(out[0], [0.6, 0.8])
    np.testing.assert_allclose(out[1], [0.0, 0.0])  # 1e-6 floor, no NaN


def test_np_loader_dict_storage(tmp_path):
    p = tmp_path / "d.npy"
    np.save(p, {"k": np.asarray([3.0, 4.0])}, allow_pickle=True)
    out = np_loader(str(p), l2norm=True)
    assert isinstance(out, dict)
    np.testing.assert_allclose(out["k"], [0.6, 0.8])


def test_memcache_caches_and_rejects(tmp_path):
    p = tmp_path / "f.npy"
    np.save(p, np.arange(3.0))
    a = memcache(str(p))
    b = memcache(str(p))
    assert a is b  # lru_cache hit
    with pytest.raises(ValueError):
        memcache(str(tmp_path / "f.pkl"))


def test_timer_check_and_reset():
    t = Timer()
    d1 = t.check()
    d2 = t.check()
    assert d1 >= 0 and d2 >= 0
    t.reset()
    assert t.check() < 10  # sanity: a fresh split, not cumulative
