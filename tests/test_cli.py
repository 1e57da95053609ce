"""CLI entry points (reference L5 scripts parity): demo / convert / serve /
train in tiny mode, in-process on CPU."""

import json
import os

import pytest


def test_demo_cli(capsys):
    from ternary_vllm_tpu.cli.demo import main

    main(["--quantization", "binary", "--tiny"])
    out = capsys.readouterr().out
    assert "compression" in out
    assert "quantized params" in out


def test_convert_then_serve_cli(tmp_path, capsys, monkeypatch):
    pytest.importorskip("orbax.checkpoint")
    from ternary_vllm_tpu.cli.convert import main as convert_main
    from ternary_vllm_tpu.cli.serve import main as serve_main

    out = str(tmp_path / "artifact")
    convert_main(["--tiny", "--quantization", "ternary", "--out", out])
    stdout = capsys.readouterr().out
    assert "saved artifact" in stdout
    assert os.path.exists(os.path.join(out, "meta.json"))

    serve_main([
        "--artifact", out, "--prompt-len", "4", "--max-new-tokens", "4",
        "--max-len", "32",
    ])
    stdout = capsys.readouterr().out
    assert "t/s" in stdout

    # engine path
    serve_main([
        "--artifact", out, "--prompt-len", "4", "--max-new-tokens", "4",
        "--max-len", "32", "--requests", "3", "--max-batch", "2",
    ])
    stdout = capsys.readouterr().out
    assert "3 requests" in stdout

    # mixed-capacity pool path (routes by worst-case live length)
    serve_main([
        "--artifact", out, "--prompt-len", "4", "--max-new-tokens", "4",
        "--requests", "3", "--pool", "16,64,2,1",
    ])
    stdout = capsys.readouterr().out
    assert "pool KV" in stdout and "3 requests" in stdout


def test_convert_a8_int8head_artifact(tmp_path, capsys):
    """--a8/--int8-head survive the artifact roundtrip: specs carry a8=True,
    lm_head stores int8 w_q, and serve decodes from the loaded artifact."""
    pytest.importorskip("orbax.checkpoint")
    from ternary_vllm_tpu.cli.convert import main as convert_main
    from ternary_vllm_tpu.cli.serve import main as serve_main
    from ternary_vllm_tpu.convert.export import load_checkpoint

    out = str(tmp_path / "artifact-a8")
    convert_main([
        "--tiny", "--quantization", "ternary", "--a8", "--int8-head", "--out", out,
    ])
    capsys.readouterr()
    params, config, specs = load_checkpoint(out)
    packed_specs = [s for layer in specs for s in layer.values() if s.kind == "packed"]
    assert packed_specs and all(s.a8 for s in packed_specs)
    assert params["lm_head"]["linear"]["w_q"].dtype.name == "int8"

    serve_main([
        "--artifact", out, "--prompt-len", "4", "--max-new-tokens", "4",
        "--max-len", "32",
    ])
    assert "t/s" in capsys.readouterr().out


def test_train_cli_smoke(tmp_path, capsys):
    pytest.importorskip("orbax.checkpoint")
    from ternary_vllm_tpu.cli.train import main

    main([
        "--tiny", "--quantization", "ternary", "--max-steps", "2",
        "--batch-size", "2", "--out", str(tmp_path / "ckpt"),
    ])
    out = capsys.readouterr().out
    assert "step 1:" in out
    assert "saved" in out


def test_env_override(monkeypatch, capsys):
    from ternary_vllm_tpu.cli.demo import main

    # env var overrides the flag (reference utils/scripting.py:4-5)
    monkeypatch.setenv("QUANTIZATION", "ternary")
    from ternary_vllm_tpu.cli.train import parse_args

    args = parse_args(["--tiny", "--quantization", "binary"])
    assert args.quantization == "ternary"


def test_serve_long_prompt_mesh_cli(tmp_path, capsys):
    """--long-prompt: ring prefill over a tp4 CPU mesh feeds the cache, TP
    decode continues — the long-context mesh serving path end-to-end."""
    pytest.importorskip("orbax.checkpoint")
    import jax

    if len(jax.devices()) < 4:
        pytest.skip("needs 4 virtual devices")
    from ternary_vllm_tpu.cli.convert import main as convert_main
    from ternary_vllm_tpu.cli.serve import main as serve_main

    out = str(tmp_path / "artifact-long")
    convert_main(["--tiny", "--quantization", "ternary", "--out", out])
    capsys.readouterr()
    serve_main([
        "--artifact", out, "--long-prompt", "--tp", "4",
        "--prompt-len", "40", "--max-len", "96", "--max-new-tokens", "4",
    ])
    stdout = capsys.readouterr().out
    assert "ring prefill T=40 over tp4" in stdout
    assert "t/s" in stdout


def test_serve_long_prompt_requires_mesh(tmp_path, capsys):
    pytest.importorskip("orbax.checkpoint")
    from ternary_vllm_tpu.cli.convert import main as convert_main
    from ternary_vllm_tpu.cli.serve import main as serve_main

    out = str(tmp_path / "artifact-long2")
    convert_main(["--tiny", "--quantization", "ternary", "--out", out])
    capsys.readouterr()
    with pytest.raises(SystemExit, match="tp >= 2"):
        serve_main(["--artifact", out, "--long-prompt", "--prompt-len", "40"])
