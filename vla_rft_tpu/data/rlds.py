"""RLDS (LIBERO) dataset pipeline.

Counterpart of the reference's TFDS/dlimp stack (prismatic/vla/datasets/
datasets.py:128-433: RLDSDataset window config — window 1 + future_action 7 +
future_obs 8 — plus RLDSBatchTransform_V1 and dataset-statistics
normalization).  Here the pipeline is first-party: tfrecords are scanned with
the native reader (vla_rft_tpu/data/tfrecord.py, csrc/tfrecord_reader.cc),
tf.train.Example decode + image decode use the installed TF on CPU, and the
window/shuffle/transform stages are plain numpy — the whole thing feeds the
jitted trainer through host RAM, no tf.data graph.

Feature keys default to the TFDS RLDS layout of modified_libero_rlds; all are
configurable.
"""
from __future__ import annotations

import dataclasses
import glob
import json
import os
from typing import Any, Callable, Dict, Iterator, List, Optional

import numpy as np

from vla_rft_tpu.data.tfrecord import read_records


@dataclasses.dataclass
class RLDSConfig:
    data_dir: str = ""
    dataset_name: str = "libero_spatial_no_noops"
    image_key: str = "steps/observation/image"
    state_key: str = "steps/observation/state"
    action_key: str = "steps/action"
    language_key: str = "steps/language_instruction"
    action_dim: int = 7
    proprio_dim: int = 8
    window_frames: int = 9  # current + 8 future obs (segment_length)
    action_chunk: int = 8  # current + 7 future actions
    policy_image_size: int = 224
    wm_image_size: int = 256
    shuffle_buffer_size: int = 10_000
    seed: int = 0


def _decode_example(raw: bytes, cfg: RLDSConfig) -> Dict[str, Any]:
    """Parse one serialized episode tf.train.Example into numpy arrays."""
    import tensorflow as tf  # CPU-only decode utility

    ex = tf.train.Example.FromString(raw)
    feats = ex.features.feature

    def bytes_list(key):
        return list(feats[key].bytes_list.value)

    def float_list(key):
        return np.asarray(feats[key].float_list.value, np.float32)

    img_bytes = bytes_list(cfg.image_key)
    dims = None
    if img_bytes and img_bytes[0][:3] == b"\xff\xd8\xff":
        from vla_rft_tpu.data.image_ops import decode_jpeg_batch, jpeg_dims

        dims = jpeg_dims(img_bytes[0])
    if dims is not None:
        # JPEG frames: native threaded decode (csrc/image_ops.cc) — no TF op
        images = list(decode_jpeg_batch(img_bytes, dims[0], dims[1]))
    else:
        images = [
            np.asarray(tf.io.decode_image(b, expand_animations=False))
            for b in img_bytes
        ]
    actions = float_list(cfg.action_key).reshape(-1, cfg.action_dim)
    states = float_list(cfg.state_key)
    states = states.reshape(-1, cfg.proprio_dim) if states.size else None
    langs = bytes_list(cfg.language_key)
    lang = langs[0].decode() if langs else ""
    return {"images": np.stack(images), "actions": actions, "states": states, "lang": lang}


def compute_dataset_statistics(actions: np.ndarray, proprio: Optional[np.ndarray]) -> Dict:
    """save_dataset_statistics parity: q01/q99/min/max/mean/std per dim
    (used by bounds_q99 normalization and by predict-time unnormalization)."""

    def stats(x):
        return {
            "mean": x.mean(0).tolist(),
            "std": x.std(0).tolist(),
            "min": x.min(0).tolist(),
            "max": x.max(0).tolist(),
            "q01": np.quantile(x, 0.01, axis=0).tolist(),
            "q99": np.quantile(x, 0.99, axis=0).tolist(),
        }

    out = {"action": stats(actions)}
    if proprio is not None:
        out["proprio"] = stats(proprio)
    return out


def normalize_bounds_q99(x: np.ndarray, stats: Dict) -> np.ndarray:
    """BOUNDS_Q99: [q01, q99] -> [-1, 1], clipped (NormalizationType)."""
    low = np.asarray(stats["q01"])
    high = np.asarray(stats["q99"])
    x = np.clip(2 * (x - low) / (high - low + 1e-8) - 1, -1, 1)
    return x.astype(np.float32)


def augment_image(img: np.ndarray, rng: np.random.Generator) -> np.ndarray:
    """Policy-image augmentation (datasets.py image_aug=True: random resized
    crop + brightness/contrast jitter, numpy equivalents of the tf ops)."""
    h, w = img.shape[:2]
    # random resized crop (scale 0.9-1.0)
    scale = rng.uniform(0.9, 1.0)
    ch, cw = int(h * scale), int(w * scale)
    y0 = rng.integers(0, h - ch + 1)
    x0 = rng.integers(0, w - cw + 1)
    img = img[y0 : y0 + ch, x0 : x0 + cw]
    img = _resize(img, h)
    # brightness / contrast jitter
    x = img.astype(np.float32)
    x = x * rng.uniform(0.9, 1.1) + rng.uniform(-0.1, 0.1) * 255.0
    return np.clip(x, 0, 255).astype(img.dtype)


def _resize(img: np.ndarray, size: int) -> np.ndarray:
    h, w = img.shape[:2]
    if (h, w) == (size, size):
        return img
    ys = (np.arange(size) * h // size).clip(0, h - 1)
    xs = (np.arange(size) * w // size).clip(0, w - 1)
    return img[ys][:, xs]


class RLDSDataset:
    """Windowed episode stream -> trainer batches.

    Yields dicts with the RFT trainer's fields (ray_trainer.py:1562-1583):
    pixel_values (B,224,224,6), proprio, input_ids/attention_mask/labels,
    actions (normalized chunk), raw_pixel_values (B,9,256,256,3).
    """

    def __init__(
        self,
        cfg: RLDSConfig,
        tokenizer,
        batch_size: int,
        max_seq_len: int = 96,
        pad_token_id: int = 151643,
        stats: Optional[Dict] = None,
        image_aug: bool = False,
    ):
        self.cfg = cfg
        self.tokenizer = tokenizer
        self.batch_size = batch_size
        self.max_seq_len = max_seq_len
        self.pad_token_id = pad_token_id
        self.image_aug = image_aug
        self._rng = np.random.default_rng(cfg.seed)
        self._step = 0

        pattern = os.path.join(cfg.data_dir, cfg.dataset_name, "*.tfrecord*")
        self.files = sorted(glob.glob(pattern))
        if not self.files:
            raise FileNotFoundError(f"no tfrecords match {pattern}")
        # dataset statistics come from the SAME files on every host (tiny
        # sample; stats must agree globally for normalization parity)
        self.stats = stats or self._compute_stats()
        # multi-host: each process reads only its stripe of the shards (the
        # reference interleaves via tf.data over per-host file subsets;
        # ray_trainer chunks DataProto per rank).  Falls back to all files
        # when there are fewer shards than processes.
        import jax as _jax

        pc, pi = _jax.process_count(), _jax.process_index()
        if pc > 1 and len(self.files) >= pc:
            self.files = self.files[pi::pc]
            self._rng = np.random.default_rng(cfg.seed + pi)

    # ------------------------------------------------------------------ state
    def state_dict(self):
        return {"step": self._step}

    def load_state_dict(self, state):
        self._step = int(state["step"])

    # ------------------------------------------------------------------ stats
    def _compute_stats(self) -> Dict:
        acts, props = [], []
        for f in self.files[:4]:  # sample a few shards
            for raw in read_records(f):
                ep = _decode_example(raw, self.cfg)
                acts.append(ep["actions"])
                if ep["states"] is not None:
                    props.append(ep["states"])
        actions = np.concatenate(acts, 0)
        proprio = np.concatenate(props, 0) if props else None
        return compute_dataset_statistics(actions, proprio)

    def save_dataset_statistics(self, path: str) -> None:
        with open(path, "w") as f:
            json.dump(self.stats, f)

    # ---------------------------------------------------------------- windows
    def _episodes(self) -> Iterator[Dict[str, Any]]:
        files = list(self.files)
        while True:
            self._rng.shuffle(files)
            for f in files:
                for raw in read_records(f):
                    yield _decode_example(raw, self.cfg)

    def _windows(self) -> Iterator[Dict[str, Any]]:
        F = self.cfg.window_frames
        C = self.cfg.action_chunk
        for ep in self._episodes():
            T = len(ep["images"])
            if T < F:
                continue
            for t in range(T - F + 1):
                yield {
                    "frames": ep["images"][t : t + F],
                    "actions": ep["actions"][t : t + C],
                    "proprio": (
                        ep["states"][t]
                        if ep["states"] is not None
                        else np.zeros(self.cfg.proprio_dim, np.float32)
                    ),
                    "lang": ep["lang"],
                }

    # ----------------------------------------------------------------- batches
    def next_batch(self) -> Dict[str, np.ndarray]:
        from vla_rft_tpu.data.prompting import build_vla_sample, pad_collate

        self._step += 1
        cfg = self.cfg
        samples, metas = [], []
        it = self._windows()
        for _ in range(self.batch_size):
            w = next(it)
            actions = normalize_bounds_q99(w["actions"], self.stats["action"])
            s = build_vla_sample(self.tokenizer, w["lang"], actions)
            samples.append(s)
            metas.append((w, actions))
        coll = pad_collate(samples, self.pad_token_id, self.max_seq_len)

        pix, raw, prop, acts = [], [], [], []
        for w, actions in metas:
            frame0 = w["frames"][0]
            if self.image_aug:
                frame0 = augment_image(frame0, self._rng)
            img = _resize(frame0, cfg.policy_image_size).astype(np.float32) / 255.0
            pix.append(np.concatenate([img, img], axis=-1))  # siglip|dino stacks
            raw.append(
                np.stack([_resize(f, cfg.wm_image_size) for f in w["frames"]]).astype(np.uint8)
            )
            prop.append(
                normalize_bounds_q99(w["proprio"], self.stats["proprio"])
                if "proprio" in self.stats
                else w["proprio"]
            )
            acts.append(actions)
        return {
            "pixel_values": np.stack(pix).astype(np.float32),
            "raw_pixel_values": np.stack(raw),
            "proprio": np.stack(prop).astype(np.float32),
            "actions": np.stack(acts).astype(np.float32),
            **coll,
            "input_ids": coll["input_ids"].astype(np.int32),
            "attention_mask": coll["attention_mask"].astype(np.int32),
            "labels": coll["labels"].astype(np.int32),
        }


def make_episode_example(
    images: List[bytes], actions: np.ndarray, states: np.ndarray, lang: str, cfg: RLDSConfig
) -> bytes:
    """Serialize one episode in the layout _decode_example expects (used by
    tests and by dataset conversion tooling)."""
    import tensorflow as tf

    feats = {
        cfg.image_key: tf.train.Feature(bytes_list=tf.train.BytesList(value=images)),
        cfg.action_key: tf.train.Feature(
            float_list=tf.train.FloatList(value=np.asarray(actions, np.float32).reshape(-1))
        ),
        cfg.state_key: tf.train.Feature(
            float_list=tf.train.FloatList(value=np.asarray(states, np.float32).reshape(-1))
        ),
        cfg.language_key: tf.train.Feature(
            bytes_list=tf.train.BytesList(value=[lang.encode()])
        ),
    }
    return tf.train.Example(
        features=tf.train.Features(feature=feats)
    ).SerializeToString()
