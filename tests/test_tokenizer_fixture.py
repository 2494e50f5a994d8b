"""Chat-template validation against a real tokenizer fixture.

The reference delegates template construction to upstream qwen_tts
(`_build_assistant_text` + `_tokenize_texts`, reference model.py:494-499) and
then slices role headers/trailers off by hardcoded counts (model.py:686-766).
This repo's PromptTokenizer builds those id sequences directly; these tests
pin them to a REAL HF fast-tokenizer pipeline (committed fixture built by
tests/fixtures/build_qwen_tokenizer.py: byte-level BPE + ChatML added
specials + the upstream chat template) instead of trusting the construction:

- assistant/ref/instruct framing == encoding of the literal ChatML strings
- assistant framing == `apply_chat_template(..., add_generation_prompt=True)`
- header/trailer lengths are exactly the 3/5/2 contract
- multi-token role names hard-error (no silent role[0] truncation)
"""
from pathlib import Path

import numpy as np
import pytest

from faster_qwen3_tts_tpu.utils.tokenizer import (
    ASSISTANT_HEADER_LEN, ASSISTANT_TRAILER_LEN, REF_TRAILER_LEN,
    HFTokenizer, PromptTokenizer, load_tokenizer,
)

FIXTURE = Path(__file__).parent / "fixtures" / "qwen_tokenizer"

pytest.importorskip("transformers")


@pytest.fixture(scope="module")
def hf_tok():
    from transformers import AutoTokenizer

    return AutoTokenizer.from_pretrained(str(FIXTURE))


@pytest.fixture(scope="module")
def prompt_tok(hf_tok):
    return PromptTokenizer(HFTokenizer(hf_tok))


TEXT = "The quick brown fox jumps over the lazy dog today."


def test_load_tokenizer_picks_hf_fixture():
    tok = load_tokenizer(str(FIXTURE))
    assert isinstance(tok, HFTokenizer)
    assert tok.IM_START != tok.IM_END


def test_assistant_framing_matches_chat_template(hf_tok, prompt_tok):
    ids = prompt_tok.assistant_ids(TEXT)[0].tolist()
    rendered = hf_tok.apply_chat_template(
        [{"role": "assistant", "content": TEXT}], add_generation_prompt=True
    )
    assert ids == rendered


def test_assistant_framing_matches_literal_string(hf_tok, prompt_tok):
    ids = prompt_tok.assistant_ids(TEXT)[0].tolist()
    want = hf_tok.encode(
        f"<|im_start|>assistant\n{TEXT}<|im_end|>\n<|im_start|>assistant\n",
        add_special_tokens=False,
    )
    assert ids == want
    # slice contract: 3-id header, 5-id trailer, text ids in between
    text_ids = hf_tok.encode(TEXT, add_special_tokens=False)
    assert ids[:ASSISTANT_HEADER_LEN] + text_ids + ids[-ASSISTANT_TRAILER_LEN:] == ids


def test_ref_framing_matches_literal_string(hf_tok, prompt_tok):
    ref = "Hello world, this is a voice cloning test sentence."
    ids = prompt_tok.ref_ids(ref)[0].tolist()
    want = hf_tok.encode(
        f"<|im_start|>assistant\n{ref}<|im_end|>\n", add_special_tokens=False
    )
    assert ids == want
    assert len(ids) == ASSISTANT_HEADER_LEN + len(
        hf_tok.encode(ref, add_special_tokens=False)
    ) + REF_TRAILER_LEN


def test_instruct_framing_is_user_turn(hf_tok, prompt_tok):
    instr = "Please read this in a calm and friendly tone."
    ids = prompt_tok.instruct_ids(instr)[0].tolist()
    want = hf_tok.apply_chat_template(
        [{"role": "user", "content": instr}], add_generation_prompt=False
    )
    assert ids == want


def test_round_trip_text(hf_tok):
    tok = HFTokenizer(hf_tok)
    ids = tok.encode(TEXT)
    assert tok.decode(ids) == TEXT


def test_multi_token_role_hard_errors():
    class FakeTok:
        vocab_size = 100

        def __len__(self):
            return 100

        def convert_tokens_to_ids(self, name):
            return {"<|im_start|>": 90, "<|im_end|>": 91}.get(name, -1)

        def encode(self, text, add_special_tokens=False):
            if text == "\n":
                return [5]
            return [1, 2]  # every role name splits into two ids

    with pytest.raises(ValueError, match="role 'assistant'"):
        HFTokenizer(FakeTok())


def test_multi_token_newline_hard_errors():
    class FakeTok:
        vocab_size = 100

        def __len__(self):
            return 100

        def convert_tokens_to_ids(self, name):
            return 90

        def encode(self, text, add_special_tokens=False):
            return [1, 2]

    with pytest.raises(ValueError, match="newline"):
        HFTokenizer(FakeTok())


def test_fixture_specials_never_split(hf_tok):
    ids = hf_tok.encode("a<|im_start|>b", add_special_tokens=False)
    assert HFTokenizer(hf_tok).IM_START in ids


def test_prompt_assembly_slices_align(hf_tok, prompt_tok):
    """The prompt layer strips the trailer and reuses the header — the exact
    slices upstream hardcodes ([:, :3], [:, 3:-5]) must recover the text."""
    ids = prompt_tok.assistant_ids(TEXT)[0]
    text_ids = np.asarray(hf_tok.encode(TEXT, add_special_tokens=False))
    np.testing.assert_array_equal(
        ids[ASSISTANT_HEADER_LEN:-ASSISTANT_TRAILER_LEN], text_ids
    )
