"""Real-data VLM QAT end-to-end through the CLI: an on-disk LLaVA/COCO
fixture (images + conversation JSON + byte tokenizer) trains via
``cli/train.py`` and the loss decreases (reference ``train.py:146-338``)."""

import json

import numpy as np
import pytest

PIL = pytest.importorskip("PIL")
from PIL import Image  # noqa: E402

from ternary_vllm_tpu.cli import train as train_cli  # noqa: E402


@pytest.fixture
def llava_fixture(tmp_path):
    coco = tmp_path / "coco" / "train2017"
    coco.mkdir(parents=True)
    llava = tmp_path / "llava"
    llava.mkdir()
    rng = np.random.default_rng(0)
    convs = []
    answers = ["a red square", "two dogs", "the beach", "a cat on a mat",
               "blue sky", "an empty room", "three birds", "a green car"]
    for i in range(8):
        name = f"img{i:04d}.jpg"
        arr = rng.integers(0, 255, (28, 28, 3), np.uint8)
        Image.fromarray(arr).save(coco / name)
        convs.append(
            {
                "image": name,
                "conversations": [
                    {"from": "human", "value": f"<image>\nWhat is in image {i}?"},
                    {"from": "gpt", "value": answers[i]},
                ],
            }
        )
    with open(llava / "conversation_58k.json", "w") as f:
        json.dump(convs, f)
    return llava, coco.parent


def test_cli_trains_vlm_on_fixture(llava_fixture, tmp_path, capsys):
    llava_root, coco_root = llava_fixture
    train_cli.main(
        [
            "--tiny",
            "--quantization", "ternary",
            "--llava-root", str(llava_root),
            "--coco-root", str(coco_root),
            "--tokenizer", "byte",
            "--batch-size", "2",
            "--epochs", "8",
            "--max-steps", "12",
            "--val-every", "6",
            "--val-samples", "2",
            "--lr", "0.05",
            "--out", str(tmp_path / "out"),
        ]
    )
    out = capsys.readouterr().out
    losses = [
        float(line.split("loss")[1].split()[0])
        for line in out.splitlines()
        if line.startswith("step ")
    ]
    assert len(losses) == 12
    assert all(np.isfinite(losses))
    # memorizing 6 train samples with a hot LR: the tail must beat the head
    assert np.mean(losses[-3:]) < np.mean(losses[:3]), losses
    # held-out validation ran and produced a finite loss
    vals = [
        float(line.split("val")[1].split()[0])
        for line in out.splitlines()
        if " val " in line and line.startswith("step ")
    ]
    assert len(vals) == 2 and all(np.isfinite(vals))
    assert "sample tokens:" in out
    # the packed artifact was written
    arts = list((tmp_path / "out").glob("phi-q2-ternary-*"))
    assert arts, "no checkpoint saved"


def test_cli_requires_tokenizer_for_llava(llava_fixture, tmp_path):
    llava_root, coco_root = llava_fixture
    with pytest.raises(SystemExit, match="tokenizer"):
        train_cli.main(
            [
                "--tiny",
                "--llava-root", str(llava_root),
                "--coco-root", str(coco_root),
            ]
        )
