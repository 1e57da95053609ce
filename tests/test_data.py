"""Data pipeline: collate layout parity with the reference
(``training/datasets/llava.py:58-108``) on a synthetic mini-dataset."""

import json

import numpy as np
import pytest

from ternary_vllm_tpu.data.llava import (
    LLavaDataset,
    data_loader,
    make_collate_fn,
    preprocess_images,
)

PIL = pytest.importorskip("PIL")
from PIL import Image  # noqa: E402


def _toy_tokenize(text):
    # deterministic fake tokenizer: one token per character, offset
    return [ord(c) % 97 + 3 for c in text]


def _mk_dataset(tmp_path):
    coco = tmp_path / "coco" / "train2017"
    coco.mkdir(parents=True)
    for name in ("a.jpg", "b.jpg"):
        Image.new("RGB", (32, 24), (128, 64, 32)).save(coco / name)
    data = [
        {
            "image": "a.jpg",
            "conversations": [
                {"from": "human", "value": "<image>\nWhat is this?"},
                {"from": "gpt", "value": "A cat."},
            ],
        },
        {
            "image": "b.jpg",
            "conversations": [
                {"from": "human", "value": "Describe.<image>"},
                {"from": "gpt", "value": "A dog."},
                {"from": "human", "value": "Color?"},
                {"from": "gpt", "value": "Brown."},
            ],
        },
    ]
    (tmp_path / "conversation_58k.json").write_text(json.dumps(data))
    return LLavaDataset(tmp_path, tmp_path / "coco")


def test_dataset_indexing(tmp_path):
    ds = _mk_dataset(tmp_path)
    assert len(ds) == 2
    s = ds[0]
    assert s["qa"][0]["question"] == "What is this?"  # <image> + newline stripped
    assert s["qa"][0]["answer"] == "A cat."
    # strided (human, gpt) pairing: 4 turns -> 2 QA pairs (the reference's
    # overlapping zip would produce 3, incl. a bogus gpt->human pair)
    assert len(ds[1]["qa"]) == 2
    assert ds[1]["qa"][1] == {"question": "Color?", "answer": "Brown."}


def test_collate_layout(tmp_path):
    ds = _mk_dataset(tmp_path)
    img_tokens = 9
    collate = make_collate_fn(
        _toy_tokenize, bos_id=1, eos_id=2, image_size=16, img_tokens=img_tokens
    )
    batch = collate([ds[0], ds[1]])
    assert batch["images"].shape == (2, 16, 16, 3)
    assert batch["images"].min() >= -1.0 and batch["images"].max() <= 1.0

    toks, labs, mask = batch["input_ids"], batch["labels"], batch["attn_mask"]
    assert toks.shape[0] == labs.shape[0] == mask.shape[0] == 2
    # labels are laid out for the SPLICED sequence: len(labels) == len(tokens) + img_tokens
    assert labs.shape[1] == toks.shape[1] + img_tokens
    # first img_tokens+1 label positions are ignored
    assert (labs[:, : img_tokens + 1] == -100).all()
    assert toks[0, 0] == 1  # BOS
    # answer tokens are labeled
    a_t = _toy_tokenize(" A cat.<|endoftext|>")
    row = labs[0][labs[0] != -100]
    np.testing.assert_array_equal(row[: len(a_t)], a_t)
    # padding: mask False exactly on padded tail
    len0 = int(mask[0].sum())
    assert (labs[0, len0:] == -100).all()


def test_data_loader_batches(tmp_path):
    ds = _mk_dataset(tmp_path)
    collate = make_collate_fn(_toy_tokenize, 1, 2, image_size=16, img_tokens=4)
    batches = list(data_loader(ds, collate, batch_size=2, shuffle=True, seed=0))
    assert len(batches) == 1
    assert batches[0]["input_ids"].shape[0] == 2


def test_preprocess_images_range():
    im = Image.new("RGB", (10, 10), (255, 255, 255))
    arr = preprocess_images([im], 8)
    assert arr.shape == (1, 8, 8, 3)
    np.testing.assert_allclose(arr, 1.0)
