"""RLDS pipeline + native TFRecord reader tests
(reference analog: tests/verl/utils/dataset/test_rl_dataset.py)."""
import os

import numpy as np
import pytest

from vla_rft_tpu.data.tfrecord import read_records, scan_records, write_records

tf = pytest.importorskip("tensorflow")

from vla_rft_tpu.data.rlds import (  # noqa: E402
    RLDSConfig,
    RLDSDataset,
    compute_dataset_statistics,
    make_episode_example,
    normalize_bounds_q99,
)


class StubTokenizer:
    def encode(self, text):
        return [hash(w) % 1000 + 10 for w in text.split()][:20] + [1, 2, 3]


def test_tfrecord_roundtrip(tmp_path):
    path = str(tmp_path / "a.tfrecord")
    payloads = [b"hello", b"x" * 1000, b""]
    write_records(path, payloads)
    got = list(read_records(path, verify_crc=True))
    assert got == payloads
    offsets = scan_records(path, verify_crc=True)
    assert len(offsets) == 3


def test_tfrecord_readable_by_tensorflow(tmp_path):
    """Our C++ framing must interop with TF's reader and vice versa."""
    path = str(tmp_path / "b.tfrecord")
    write_records(path, [b"abc", b"defg"])
    got = [r.numpy() for r in tf.data.TFRecordDataset(path)]
    assert got == [b"abc", b"defg"]
    # TF-written file read by our scanner
    path2 = str(tmp_path / "c.tfrecord")
    with tf.io.TFRecordWriter(path2) as w:
        w.write(b"123")
        w.write(b"45678")
    assert list(read_records(path2, verify_crc=True)) == [b"123", b"45678"]


def _write_fake_dataset(tmp_path, cfg, n_episodes=3, T=12):
    rng = np.random.default_rng(0)
    d = tmp_path / cfg.dataset_name
    d.mkdir()
    payloads = []
    for e in range(n_episodes):
        imgs = []
        for t in range(T):
            arr = rng.integers(0, 255, (32, 32, 3), np.uint8)
            imgs.append(tf.io.encode_png(arr).numpy())
        actions = rng.uniform(-0.4, 0.4, (T, 7))
        states = rng.normal(size=(T, 8))
        payloads.append(make_episode_example(imgs, actions, states, f"task {e}", cfg))
    write_records(str(d / "shard-0.tfrecord"), payloads)
    return str(tmp_path)


def test_rlds_dataset_batches(tmp_path):
    cfg = RLDSConfig(
        data_dir="", dataset_name="fake_ds", window_frames=9, action_chunk=8,
        policy_image_size=28, wm_image_size=32,
    )
    data_dir = _write_fake_dataset(tmp_path, cfg)
    cfg = RLDSConfig(**{**cfg.__dict__, "data_dir": data_dir})
    ds = RLDSDataset(cfg, StubTokenizer(), batch_size=2, max_seq_len=96)
    b = ds.next_batch()
    assert b["pixel_values"].shape == (2, 28, 28, 6)
    assert b["raw_pixel_values"].shape == (2, 9, 32, 32, 3)
    assert b["actions"].shape == (2, 8, 7)
    assert b["proprio"].shape == (2, 8)
    assert b["input_ids"].shape == (2, 96)
    assert (np.abs(b["actions"]) <= 1.0).all()  # bounds_q99 normalized
    # exactly 64 action tokens per sample where labels are unmasked (the pad
    # token 151643 is also > ACTION_TOKEN_BEGIN_IDX but has label IGNORE —
    # the action masks read labels, train_utils.py:8-41)
    assert ((b["labels"] > 151386) & (b["labels"] != -100)).sum() == 2 * 64
    # resume bookkeeping
    st = ds.state_dict()
    ds.load_state_dict(st)
    assert ds.state_dict() == st


def test_stats_and_normalization():
    rng = np.random.default_rng(0)
    actions = rng.normal(size=(1000, 7))
    stats = compute_dataset_statistics(actions, None)["action"]
    x = normalize_bounds_q99(actions, stats)
    assert (np.abs(x) <= 1.0).all()
    frac_clipped = np.mean((np.abs(x) == 1.0).astype(np.float32))
    assert frac_clipped < 0.05  # only the tails clip


def test_prefetching_loader():
    from vla_rft_tpu.data.prefetch import PrefetchingLoader

    class Counter:
        def __init__(self):
            self.i = 0

        def next_batch(self):
            self.i += 1
            return {"i": self.i}

        def state_dict(self):
            return {"step": self.i}

        def load_state_dict(self, s):
            self.i = s["step"]

    loader = PrefetchingLoader(Counter(), buffer_size=2)
    got = [loader.next_batch()["i"] for _ in range(5)]
    assert got == sorted(got) and len(set(got)) == 5
    loader.close()


def test_load_action_ranges_formats(tmp_path):
    import json

    import numpy as np

    from vla_rft_tpu.data.synthetic import load_action_ranges

    a = np.asarray([[-1.0, 1.0], [-0.5, 0.25]], np.float32)
    np.save(tmp_path / "r.npy", a)
    np.testing.assert_allclose(load_action_ranges(str(tmp_path / "r.npy")), a)
    (tmp_path / "r.json").write_text(json.dumps(a.tolist()))
    np.testing.assert_allclose(load_action_ranges(str(tmp_path / "r.json")), a)
    try:
        import torch

        torch.save(torch.tensor(a), tmp_path / "r.pth")
        np.testing.assert_allclose(load_action_ranges(str(tmp_path / "r.pth")), a)
    except ImportError:
        pass
