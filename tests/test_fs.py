"""utils/fs parity (verl/utils/fs.py + hdfs_io.py)."""
import os

import pytest

from vla_rft_tpu.utils import fs


def test_local_passthrough(tmp_path):
    p = tmp_path / "a.txt"
    p.write_text("hi")
    assert fs.copy_to_local(str(p)) == str(p)
    assert fs.copy_to_local(f"file://{p}") == str(p)
    assert not fs.is_non_local(str(p))
    assert fs.is_non_local("gs://bucket/x") and fs.is_non_local("hdfs://nn/x")


def test_local_copy_and_makedirs(tmp_path):
    src = tmp_path / "src.txt"
    src.write_text("data")
    dst = tmp_path / "sub" / "dst.txt"
    fs.makedirs(str(tmp_path / "sub"))
    fs.copy(str(src), str(dst))
    assert dst.read_text() == "data"
    d = tmp_path / "tree"
    (d / "in").mkdir(parents=True)
    (d / "in" / "f").write_text("x")
    fs.copy(str(d), str(tmp_path / "tree2"))
    assert (tmp_path / "tree2" / "in" / "f").read_text() == "x"


def test_remote_cache_keying(tmp_path, monkeypatch):
    calls = []
    monkeypatch.setattr(fs, "_copy_remote", lambda s, d: (calls.append(s), open(d, "w").write("r")))
    out1 = fs.copy_to_local("gs://b/model.bin", cache_dir=str(tmp_path))
    out2 = fs.copy_to_local("gs://b/model.bin", cache_dir=str(tmp_path))
    assert out1 == out2 and open(out1).read() == "r"
    assert len(calls) == 1  # second call served from cache
    assert fs.md5_encode("gs://b/model.bin") in out1
