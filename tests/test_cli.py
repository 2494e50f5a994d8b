"""CLI argument-surface tests (mirrors reference tests/test_ggml_backend.py:425-450
CLI flag parsing coverage)."""
import pytest

from faster_qwen3_tts_tpu.cli import build_parser


def test_clone_flags_parse():
    ap = build_parser()
    args = ap.parse_args(
        [
            "clone", "hello world", "--ref-audio", "ref.wav", "--ref-text", "hi",
            "--backend", "native", "--quant", "Q8_0", "--streaming",
            "--chunk-size", "4", "--xvec-only", "--language", "French",
        ]
    )
    assert args.command == "clone"
    assert args.backend == "native" and args.quant == "Q8_0"
    assert args.streaming and args.chunk_size == 4 and args.xvec_only
    assert args.language == "French"


def test_aot_cache_flag_sets_env(monkeypatch, tmp_path):
    """--aot-cache routes to FQ3T_AOT_CACHE before the model loads, so every
    engine dispatch goes through the executable cache (engine/aot.py)."""
    import os

    from faster_qwen3_tts_tpu import cli

    ap = build_parser()
    args = ap.parse_args(["clone", "hi", "--ref-audio", "r.wav",
                          "--aot-cache", str(tmp_path)])
    assert args.aot_cache == str(tmp_path)
    monkeypatch.delenv("FQ3T_AOT_CACHE", raising=False)
    sentinel = RuntimeError("stop before model construction")

    def fake_from_pretrained(*a, **k):
        assert os.environ.get("FQ3T_AOT_CACHE") == str(tmp_path)
        raise sentinel

    monkeypatch.setattr(
        "faster_qwen3_tts_tpu.model.FasterQwen3TTS.from_pretrained",
        fake_from_pretrained,
    )
    with pytest.raises(RuntimeError, match="stop before model construction"):
        cli._load_model(args)


def test_custom_and_design_flags():
    ap = build_parser()
    a = ap.parse_args(["custom", "--list-speakers"])
    assert a.list_speakers
    d = ap.parse_args(["design", "text", "--instruct", "warm narrator"])
    assert d.instruct == "warm narrator"
    s = ap.parse_args(["serve", "--mode", "custom", "--speaker", "aiden"])
    assert s.mode == "custom" and s.speaker == "aiden"


def test_clone_requires_ref(capsys):
    from faster_qwen3_tts_tpu import cli

    ap = build_parser()
    args = ap.parse_args(["clone", "hello"])
    assert cli.cmd_clone(args) == 2
    assert "ref-audio" in capsys.readouterr().err
    # ICL without ref text
    args = ap.parse_args(["clone", "hello", "--ref-audio", "x.wav"])
    assert cli.cmd_clone(args) == 2


def test_design_requires_instruct():
    ap = build_parser()
    with pytest.raises(SystemExit):
        ap.parse_args(["design", "text"])


def test_bundle_flags_parse():
    ap = build_parser()
    args = ap.parse_args(
        ["bundle", "/tmp/out_bundle", "--model", "ckpt_dir", "--quant", "Q8_0"]
    )
    assert args.command == "bundle"
    assert args.out_dir == "/tmp/out_bundle" and args.quant == "Q8_0"
    assert not args.full_f32
