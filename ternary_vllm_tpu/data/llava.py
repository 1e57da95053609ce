"""LLaVA-Instruct + COCO data pipeline, torch-free.

Capability parity with the reference's dataset layer (reference
``training/datasets/llava.py:11-108``):

* ``LLavaDataset`` indexes COCO images on disk and yields
  ``{"image": PIL.Image, "qa": [{"question", "answer"}, ...]}`` with the
  ``<image>`` placeholder stripped from questions (``llava.py:44-53``).
* ``make_collate_fn`` builds the training batch: token stream
  ``BOS + ("\\n\\nQuestion: …\\n\\nAnswer:" + " answer<eos>")*`` per QA turn;
  labels are −100 everywhere except answer tokens and are laid out for the
  *spliced* sequence (BOS + IMG_TOKENS image positions + text,
  ``llava.py:70-87``); right-padding with EOS; bool attention mask
  (``llava.py:89-101``).

Outputs are numpy arrays ready for ``jnp.asarray``; batching is a plain
shuffled generator (``data_loader``) — no torch DataLoader needed.
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Callable, Dict, Iterator, List, Optional

import numpy as np

IMG_TOKENS = 729  # reference train.py:144
ANSWER_EOS = "<|endoftext|>"  # reference train.py:140


class LLavaDataset:
    def __init__(self, root, coco_root, file: str = "conversation_58k.json"):
        root, coco_root = Path(root), Path(coco_root)
        self.file = root / file
        images = {}
        if (coco_root / "images").exists():
            all_paths = coco_root.glob("images/*/*.jpg")
        else:
            all_paths = coco_root.glob("*/*.jpg")
        for im_path in all_paths:
            images[im_path.name] = im_path
        self.images = images
        with open(self.file) as f:
            self.data = json.load(f)

    def __len__(self):
        return len(self.data)

    def __getitem__(self, idx):
        from PIL import Image

        sample = self.data[idx]
        im = Image.open(self.images[sample["image"]])
        convs = sample["conversations"]
        assert len(convs) % 2 == 0
        assert convs[0]["from"] == "human"
        # NOTE deviation from the reference: ``llava.py:44-53`` pairs with
        # ``zip(convs, convs[1:])`` which also yields bogus (gpt -> human)
        # pairs for multi-turn samples; we pair strided (human, gpt) turns.
        return {
            "image": im,
            "qa": [
                {
                    "question": q["value"].replace("<image>", "").replace("\n", ""),
                    "answer": a["value"],
                }
                for q, a in zip(convs[::2], convs[1::2])
            ],
        }


def preprocess_images(images, image_size: int) -> np.ndarray:
    """PIL images -> (B, H, W, 3) float32 in [-1, 1] (SigLIP normalization)."""
    out = []
    for im in images:
        im = im.convert("RGB").resize((image_size, image_size))
        arr = np.asarray(im, np.float32) / 255.0
        out.append(arr * 2.0 - 1.0)
    return np.stack(out)


def make_collate_fn(
    tokenize: Callable[[str], List[int]],
    bos_id: int,
    eos_id: int,
    image_size: int = 378,
    img_tokens: int = IMG_TOKENS,
    answer_eos: str = ANSWER_EOS,
):
    """``tokenize``: text -> token ids WITHOUT special tokens (the reference
    calls HF ``tokenizer(..., add_special_tokens=False)``)."""

    def collate(batch) -> Dict[str, np.ndarray]:
        images = preprocess_images([s["image"] for s in batch], image_size)
        tokens_acc, labels_acc = [], []
        for sample in batch:
            toks = [bos_id]
            labs = [-100] * (img_tokens + 1)
            for qa in sample["qa"]:
                q_t = tokenize(f"\n\nQuestion: {qa['question']}\n\nAnswer:")
                toks.extend(q_t)
                labs.extend([-100] * len(q_t))
                a_t = tokenize(f" {qa['answer']}{answer_eos}")
                toks.extend(a_t)
                labs.extend(a_t)
            tokens_acc.append(toks)
            labels_acc.append(labs)

        max_len = max(len(l) for l in labels_acc)
        attn = []
        for i in range(len(batch)):
            len_i = len(labels_acc[i])
            pad_i = max_len - len_i
            labels_acc[i].extend([-100] * pad_i)
            tokens_acc[i].extend([eos_id] * pad_i)
            attn.append([1] * len_i + [0] * pad_i)

        return {
            "images": images,
            "input_ids": np.asarray(tokens_acc, np.int32),
            "labels": np.asarray(labels_acc, np.int32),
            "attn_mask": np.asarray(attn, bool),
        }

    return collate


def data_loader(
    dataset,
    collate_fn,
    batch_size: int,
    shuffle: bool = True,
    seed: int = 0,
    drop_last: bool = True,
) -> Iterator[Dict[str, np.ndarray]]:
    """Minimal shuffled batching generator (DataLoader replacement)."""
    idx = np.arange(len(dataset))
    if shuffle:
        np.random.default_rng(seed).shuffle(idx)
    for start in range(0, len(idx), batch_size):
        chunk = idx[start : start + batch_size]
        if drop_last and len(chunk) < batch_size:
            return
        yield collate_fn([dataset[int(i)] for i in chunk])
