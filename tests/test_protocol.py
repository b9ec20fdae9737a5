"""Batch container parity with DataProto semantics
(reference: train/verl/tests/utility/test_tensor_dict_utilities.py)."""
import numpy as np
import pytest

from vla_rft_tpu.protocol import Batch, pad_to_divisor, unpad


def _mk(n=8):
    return Batch.from_dict(
        tensors={"a": np.arange(n * 3).reshape(n, 3), "b": np.ones((n, 2, 2))},
        non_tensors={"uid": [f"u{i}" for i in range(n)]},
        meta={"m": 1},
    )


def test_len_and_keys():
    b = _mk()
    assert len(b) == 8
    assert "a" in b and "uid" in b and "zzz" not in b


def test_chunk_concat_roundtrip():
    b = _mk(8)
    chunks = b.chunk(4)
    assert len(chunks) == 4 and len(chunks[0]) == 2
    back = Batch.concat(chunks)
    np.testing.assert_array_equal(back["a"], b["a"])
    assert list(back["uid"]) == list(b["uid"])


def test_chunk_indivisible_raises():
    with pytest.raises(ValueError):
        _mk(8).chunk(3)


def test_union_and_conflict():
    b = _mk(4)
    other = Batch.from_dict(tensors={"c": np.zeros((4, 1))})
    b.union(other)
    assert "c" in b.data
    with pytest.raises(ValueError):
        b.union(_mk(6))


def test_select_pop():
    b = _mk()
    sel = b.select(batch_keys=["a"])
    assert set(sel.data) == {"a"} and set(sel.non_tensor) == {"uid"}
    popped = b.pop(batch_keys=["a"])
    assert "a" in popped.data and "a" not in b.data


def test_repeat_interleave():
    b = _mk(2)
    r = b.repeat(3, interleave=True)
    assert len(r) == 6
    np.testing.assert_array_equal(r["a"][0], r["a"][2])
    assert list(r["uid"][:3]) == ["u0", "u0", "u0"]
    r2 = b.repeat(2, interleave=False)
    np.testing.assert_array_equal(r2["a"][0], r2["a"][2])
    assert list(r2["uid"]) == ["u0", "u1", "u0", "u1"]


def test_reorder():
    b = _mk(4)
    r = b.reorder([3, 2, 1, 0])
    np.testing.assert_array_equal(r["a"][0], b["a"][3])
    assert r["uid"][0] == "u3"


def test_pad_unpad():
    b = _mk(5)
    p, pad = pad_to_divisor(b, 4)
    assert len(p) == 8 and pad == 3
    np.testing.assert_array_equal(p["a"][5], b["a"][0])
    u = unpad(p, pad)
    assert len(u) == 5


def test_make_iterator():
    b = _mk(8)
    batches = list(b.make_iterator(mini_batch_size=4, epochs=2, seed=0, shuffle=True))
    assert len(batches) == 4
    assert all(len(x) == 4 for x in batches)


def test_getitem_slice_and_int():
    b = _mk(4)
    one = b[1]
    assert len(one) == 1 and one["uid"][0] == "u1"
    sl = b[1:3]
    assert len(sl) == 2
