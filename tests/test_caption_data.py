"""AlignCaptionDataset / FinetuneChatDataset vs the reference's pretraining
data semantics (prismatic/preprocessing/datasets/datasets.py:30-204,
materialize.py:24-42)."""
import json

import numpy as np
import pytest

from vla_rft_tpu.data.caption import (
    IGNORE_INDEX,
    AlignCaptionDataset,
    FinetuneChatDataset,
    get_caption_dataset,
)


class StubTokenizer:
    """Word-id tokenizer; no __call__, so the HF path falls through to
    encode() (hub-free)."""

    eos_token = "<eos>"
    bos_token_id = 1
    _vocab = {}

    def encode(self, text):
        ids = []
        for w in text.split():
            ids.append(self._vocab.setdefault(w, len(self._vocab) + 2))
        return ids


@pytest.fixture(scope="module")
def data_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("caption")
    from PIL import Image

    for name in ("a.png", "b.png"):
        Image.fromarray(
            np.random.default_rng(0).integers(0, 255, (16, 20, 3), np.uint8)
        ).save(d / name)
    align = [
        {
            "image": "a.png",
            "conversations": [
                {"from": "human", "value": "Describe the photo.\n<image>"},
                {"from": "gpt", "value": "a red block on a table"},
            ],
        },
        {
            "image": "b.png",
            "conversations": [
                {"from": "human", "value": "<image>\nCaption this."},
                {"from": "gpt", "value": "two gears meshing"},
            ],
        },
    ]
    instruct = [
        {
            "image": "a.png",
            "conversations": [
                {"from": "human", "value": "<image>\nWhat is this?"},
                {"from": "gpt", "value": "a red block"},
                {"from": "human", "value": "What color?"},
                {"from": "gpt", "value": "red"},
            ],
        },
        {  # unimodal (language-only) row, datasets.py:188-196
            "conversations": [
                {"from": "human", "value": "Say hi."},
                {"from": "gpt", "value": "hi"},
            ],
        },
    ]
    (d / "chat.json").write_text(json.dumps(align))
    (d / "instruct.json").write_text(json.dumps(instruct))
    return d


def _mk(cls, d, fname, **kw):
    return cls(
        json_path=str(d / fname), image_dir=str(d), tokenizer=StubTokenizer(),
        image_size=8, batch_size=2, seq_len=32, seed=0, **kw,
    )


def test_align_batch_shapes_and_masking(data_dir):
    ds = _mk(AlignCaptionDataset, data_dir, "chat.json")
    b = ds.next_batch()
    assert b["input_ids"].shape == (2, 32)
    assert b["pixel_values"].shape == (2, 8, 8, 6)
    assert b["pixel_values"].dtype == np.float32
    # dual-tower stacking: channels 0:3 == 3:6
    np.testing.assert_array_equal(b["pixel_values"][..., :3], b["pixel_values"][..., 3:])
    assert b["is_multimodal"].tolist() == [1, 1]
    for i in range(2):
        ids, lab, am = b["input_ids"][i], b["labels"][i], b["attention_mask"][i]
        assert ids[0] == StubTokenizer.bos_token_id
        assert lab[0] == IGNORE_INDEX  # BOS ignored (patches inserted after)
        n = int(am.sum())
        # every non-BOS valid token is supervised with its own id
        np.testing.assert_array_equal(lab[1:n], ids[1:n])
        assert (lab[n:] == IGNORE_INDEX).all()


def test_align_epoch_covers_all_examples(data_dir):
    ds = _mk(AlignCaptionDataset, data_dir, "chat.json")
    b = ds.next_batch()
    # batch_size == dataset size -> one epoch, both captions present
    firsts = {int(x) for x in b["input_ids"][:, 1]}
    assert len(firsts) == 2


def test_finetune_turn_masking(data_dir):
    ds = _mk(FinetuneChatDataset, data_dir, "instruct.json")
    b = ds.next_batch()
    ismm = b["is_multimodal"]
    assert sorted(ismm.tolist()) == [0, 1]
    uni = int(np.argmin(ismm))
    # unimodal row: zero pixels
    assert not b["pixel_values"][uni].any()
    for i in range(2):
        lab, am = b["labels"][i], b["attention_mask"][i]
        n = int(am.sum())
        sup = (lab[:n] != IGNORE_INDEX)
        # human turns (and the system preamble) are IGNORE'd, gpt turns
        # supervised -> strictly between 0 and n supervised tokens
        assert 0 < int(sup.sum()) < n
        # prompt prefix (system + first human turn) never supervised
        assert not sup[0]
    # multimodal row: BOS label ignored
    mm = int(np.argmax(ismm))
    assert b["labels"][mm][0] == IGNORE_INDEX


def test_finetune_last_gpt_turn_supervised_with_eos(data_dir):
    ds = _mk(FinetuneChatDataset, data_dir, "instruct.json")
    tok = ds.tokenizer
    t = ds._tokenize(ds.examples[0])
    ids, lab = t["input_ids"], t["labels"]
    # final token belongs to the last gpt turn delta (which got <eos>
    # appended) and is supervised
    assert lab[-1] == ids[-1] != IGNORE_INDEX
    eos_id = tok.encode("<eos>")  # may merge with the closing im_end token
    assert len(eos_id) >= 1


def test_registry_and_modality_lengths(data_dir):
    ds = get_caption_dataset(
        "align", json_path=str(data_dir / "chat.json"), image_dir=str(data_dir),
        tokenizer=StubTokenizer(), image_size=8, batch_size=1, seq_len=16,
    )
    assert isinstance(ds, AlignCaptionDataset)
    ml = ds.get_modality_lengths()
    assert all(is_mm for is_mm, _ in ml) and all(n > 0 for _, n in ml)
    with pytest.raises(ValueError):
        get_caption_dataset("pretrain-zzz")
