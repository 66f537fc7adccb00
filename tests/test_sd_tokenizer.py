"""CLIP BPE tokenizer vs the transformers implementation (oracle).

Builds a miniature-but-genuine vocab (full GPT-2 byte alphabet + real merge
rules + specials) in the exact HF file format an SD checkpoint ships
(``tokenizer/vocab.json`` + ``merges.txt``), then requires token-for-token
agreement with ``transformers.CLIPTokenizer`` on varied prompts —
the reference's prompt path is ``dift_sd.py:162-186``."""

import json
import os

import numpy as np
import pytest

from midvision_probe_tpu.models.sd.tokenizer import (
    CLIPTokenizer,
    bytes_to_unicode,
)

PROMPTS = [
    "a photo of a cat",
    "A PHOTO of a Dog!",
    "the person's hat, they'll like it...   extra   spaces",
    "",
    "word " * 100,  # truncation
    "numbers 123 and symbols #@!",
]


@pytest.fixture(scope="module")
def tok_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("tokenizer")
    byte_vocab = list(bytes_to_unicode().values())
    merges = [
        ("t", "h"), ("th", "e</w>"), ("a", "t</w>"), ("o", "f</w>"),
        ("c", "at</w>"), ("d", "o"), ("do", "g</w>"), ("p", "h"),
        ("o", "t"), ("ph", "ot"), ("phot", "o</w>"), ("a", "n"),
        ("an", "d</w>"), ("e", "r"), ("w", "o"), ("wo", "r"),
        ("wor", "d</w>"), ("1", "2"),
    ]
    tokens = byte_vocab + [v + "</w>" for v in byte_vocab]
    tokens += ["".join(m) for m in merges]
    tokens += ["<|startoftext|>", "<|endoftext|>"]
    vocab = {t: i for i, t in enumerate(tokens)}
    with open(d / "vocab.json", "w") as f:
        json.dump(vocab, f)
    with open(d / "merges.txt", "w") as f:
        f.write("#version: 0.2\n")
        for a, b in merges:
            f.write(f"{a} {b}\n")
    return str(d)


def test_matches_transformers_clip_tokenizer(tok_dir):
    transformers = pytest.importorskip("transformers")
    hf = transformers.CLIPTokenizer(
        os.path.join(tok_dir, "vocab.json"),
        os.path.join(tok_dir, "merges.txt"),
    )
    mine = CLIPTokenizer.from_dir(tok_dir)
    ref = hf(PROMPTS, padding="max_length", max_length=77,
             truncation=True, return_tensors="np").input_ids
    got = mine(PROMPTS)
    np.testing.assert_array_equal(got, ref)


def test_pad_token_from_config(tok_dir):
    """SD-2.x ships pad_token '!' (id of '!'); config must be honored."""
    with open(os.path.join(tok_dir, "tokenizer_config.json"), "w") as f:
        json.dump({"pad_token": "!"}, f)
    try:
        mine = CLIPTokenizer.from_dir(tok_dir)
        ids = mine(["a"])
        assert ids[0, -1] == mine.encoder["!"]
    finally:
        os.remove(os.path.join(tok_dir, "tokenizer_config.json"))


def test_roundtrip_stability(tok_dir):
    mine = CLIPTokenizer.from_dir(tok_dir)
    a = mine(["a photo of a cat"])
    b = mine(["a  PHOTO of a cat "])  # case/whitespace-insensitive
    np.testing.assert_array_equal(a, b)
    assert a.shape == (1, 77)
