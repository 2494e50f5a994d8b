"""Build the committed Qwen-style tokenizer fixture (run once, output committed).

Produces tests/fixtures/qwen_tokenizer/{tokenizer.json,tokenizer_config.json}:
a REAL `tokenizers` byte-level BPE pipeline with the Qwen tokenizer's
structure — byte-level pre-tokenizer, BPE merges, ChatML special tokens
(`<|im_start|>`, `<|im_end|>`, `<|endoftext|>`) as added tokens after the
base vocab, and the upstream ChatML chat template in tokenizer_config.json.

The vocab is trained on a tiny corpus (ids differ from the 151k-entry
production Qwen vocab) but the PIPELINE semantics are the real ones: role
names tokenize to single tokens, "\n" is its own byte-level token, special
tokens never split. tests/test_tokenizer_fixture.py uses it to pin
PromptTokenizer's framing to `apply_chat_template` — the validation the
reference delegates to upstream (reference model.py:494-499).

    python tests/fixtures/build_qwen_tokenizer.py
"""
from __future__ import annotations

import json
from pathlib import Path

from tokenizers import Tokenizer, models, pre_tokenizers, decoders, trainers

OUT = Path(__file__).parent / "qwen_tokenizer"

CORPUS = [
    "assistant user system\n",
    "assistant\n" * 8,
    "user\n" * 8,
    "The quick brown fox jumps over the lazy dog today.",
    "Hello world, this is a voice cloning test sentence.",
    "Please read this in a calm and friendly tone.",
    "speech synthesis reference audio text prompt",
    "0123456789 .,!?'\"-:;()",
]


def main() -> None:
    tok = Tokenizer(models.BPE(unk_token=None, byte_fallback=False))
    tok.pre_tokenizer = pre_tokenizers.ByteLevel(add_prefix_space=False, use_regex=True)
    tok.decoder = decoders.ByteLevel()
    trainer = trainers.BpeTrainer(
        vocab_size=640,
        initial_alphabet=pre_tokenizers.ByteLevel.alphabet(),
        show_progress=False,
    )
    tok.train_from_iterator(CORPUS, trainer)
    # ChatML specials appended after the base vocab, exactly like Qwen's
    # added_tokens block (never split, not part of BPE).
    tok.add_special_tokens(["<|endoftext|>", "<|im_start|>", "<|im_end|>"])

    for role in ("assistant", "user"):
        ids = tok.encode(role, add_special_tokens=False).ids
        assert len(ids) == 1, f"{role!r} must be a single token, got {ids}"

    OUT.mkdir(parents=True, exist_ok=True)
    tok.save(str(OUT / "tokenizer.json"))

    # The upstream Qwen ChatML template (minimal form: the TTS flow only
    # renders bare role turns, no tools/system injection).
    chat_template = (
        "{%- for message in messages -%}"
        "{{- '<|im_start|>' + message['role'] + '\n' + message['content']"
        " + '<|im_end|>' + '\n' -}}"
        "{%- endfor -%}"
        "{%- if add_generation_prompt -%}{{- '<|im_start|>assistant\n' -}}{%- endif -%}"
    )
    cfg = {
        "tokenizer_class": "PreTrainedTokenizerFast",
        "bos_token": None,
        "eos_token": "<|im_end|>",
        "pad_token": "<|endoftext|>",
        "additional_special_tokens": ["<|im_start|>", "<|im_end|>"],
        "chat_template": chat_template,
        "clean_up_tokenization_spaces": False,
        "model_max_length": 131072,
    }
    (OUT / "tokenizer_config.json").write_text(json.dumps(cfg, indent=1))
    print("wrote", OUT)


if __name__ == "__main__":
    main()
