"""Self-contained CLIP byte-level BPE tokenizer.

The reference tokenizes prompts with the HF tokenizer bundled in the SD-2.1
repo (``dift_sd.py:162-186`` via ``OneStepSDPipeline.from_pretrained``). In
a zero-egress environment the vocab must come from local files; this module
implements the CLIP BPE algorithm directly so prompt encoding needs only
``vocab.json`` + ``merges.txt`` under the checkpoint dir — no ``transformers``
tokenizer machinery (and no ftfy; CLIP's cleanup beyond whitespace/lowercase
only matters for malformed unicode).

Algorithm (openai/CLIP ``simple_tokenizer.py``, which HF CLIPTokenizer
replicates): GPT-2 byte→unicode mapping, word-level regex split, BPE merges
with ``</w>`` end-of-word marker, ``<|startoftext|>``/``<|endoftext|>``
specials, fixed 77-token context with eos-padding.

Verified token-for-token against ``transformers.CLIPTokenizer`` in
``tests/test_sd_tokenizer.py``.
"""

from __future__ import annotations

import functools
import gzip
import html
import json
import os

import regex as re

_PAT = re.compile(
    r"""<\|startoftext\|>|<\|endoftext\|>|'s|'t|'re|'ve|'m|'ll|'d|"""
    r"""[\p{L}]+|[\p{N}]|[^\s\p{L}\p{N}]+""",
    re.IGNORECASE,
)


@functools.lru_cache()
def bytes_to_unicode() -> dict[int, str]:
    """GPT-2's reversible byte→printable-unicode map."""
    bs = (list(range(ord("!"), ord("~") + 1))
          + list(range(ord("¡"), ord("¬") + 1))
          + list(range(ord("®"), ord("ÿ") + 1)))
    cs = bs[:]
    n = 0
    for b in range(2**8):
        if b not in bs:
            bs.append(b)
            cs.append(2**8 + n)
            n += 1
    return dict(zip(bs, [chr(c) for c in cs]))


def _whitespace_clean(text: str) -> str:
    return re.sub(r"\s+", " ", text).strip()


class CLIPTokenizer:
    """vocab: token string → id; merges: ordered (a, b) pairs."""

    def __init__(self, vocab: dict[str, int], merges: list[tuple[str, str]],
                 bos: str = "<|startoftext|>", eos: str = "<|endoftext|>",
                 pad: str | None = None, context_length: int = 77):
        self.encoder = dict(vocab)
        self.bpe_ranks = {tuple(m): i for i, m in enumerate(merges)}
        self.byte_encoder = bytes_to_unicode()
        self.bos_id = self.encoder[bos]
        self.eos_id = self.encoder[eos]
        self.pad_id = self.encoder[pad] if pad else self.eos_id
        self.context_length = context_length
        self._cache: dict[str, list[str]] = {
            bos: [bos], eos: [eos],
        }

    # ------------------------------------------------------------------ io
    @classmethod
    def from_dir(cls, path: str, **kw) -> "CLIPTokenizer":
        """Load HF-format ``vocab.json`` + ``merges.txt`` (the files shipped
        in every SD checkpoint's ``tokenizer/`` subfolder)."""
        with open(os.path.join(path, "vocab.json")) as f:
            vocab = json.load(f)
        merges = []
        with open(os.path.join(path, "merges.txt")) as f:
            for line in f:
                line = line.strip()
                if not line or line.startswith("#version"):
                    continue
                a, b = line.split()
                merges.append((a, b))
        # SD-2.x tokenizers pad with "!" (id 0); detect from the HF config
        pad = None
        cfg_path = os.path.join(path, "tokenizer_config.json")
        if os.path.exists(cfg_path):
            with open(cfg_path) as f:
                tok_cfg = json.load(f)
            pt = tok_cfg.get("pad_token")
            if isinstance(pt, dict):
                pt = pt.get("content")
            if pt in vocab:
                pad = pt
        return cls(vocab, merges, pad=pad, **kw)

    @classmethod
    def from_gzip(cls, path: str, **kw) -> "CLIPTokenizer":
        """openai/CLIP's ``bpe_simple_vocab_16e6.txt.gz`` single-file format."""
        with gzip.open(path, "rt", encoding="utf-8") as f:
            lines = f.read().split("\n")
        merges = [tuple(m.split()) for m in lines[1:48895]]
        byte_vocab = list(bytes_to_unicode().values())
        tokens = byte_vocab + [v + "</w>" for v in byte_vocab]
        tokens += ["".join(m) for m in merges]
        tokens += ["<|startoftext|>", "<|endoftext|>"]
        # match SD-2.x HF tokenizers, which pad with "!" (id 0) — eos
        # padding would change every pad position's text embedding (the
        # text encoder has no attention mask and the UNet cross-attends
        # over all 77 slots)
        kw.setdefault("pad", "!")
        return cls({t: i for i, t in enumerate(tokens)}, merges, **kw)

    # ----------------------------------------------------------------- bpe
    def _bpe(self, token: str) -> list[str]:
        if token in self._cache:
            return self._cache[token]
        word = tuple(token[:-1]) + (token[-1] + "</w>",)
        while len(word) > 1:
            pairs = set(zip(word[:-1], word[1:]))
            best = min(pairs,
                       key=lambda p: self.bpe_ranks.get(p, float("inf")))
            if best not in self.bpe_ranks:
                break
            a, b = best
            new_word: list[str] = []
            i = 0
            while i < len(word):
                if i < len(word) - 1 and word[i] == a and word[i + 1] == b:
                    new_word.append(a + b)
                    i += 2
                else:
                    new_word.append(word[i])
                    i += 1
            word = tuple(new_word)
        out = list(word)
        self._cache[token] = out
        return out

    def encode(self, text: str) -> list[int]:
        """Text → BPE ids (no specials)."""
        text = _whitespace_clean(html.unescape(html.unescape(text))).lower()
        ids: list[int] = []
        for token in re.findall(_PAT, text):
            token = "".join(self.byte_encoder[b]
                            for b in token.encode("utf-8"))
            ids.extend(self.encoder[t] for t in self._bpe(token))
        return ids

    def __call__(self, prompts: list[str] | str):
        """Batch-encode to the fixed (B, 77) context with bos/eos + padding
        and truncation (HF ``padding='max_length', truncation=True``)."""
        import numpy as np

        if isinstance(prompts, str):
            prompts = [prompts]
        n = self.context_length
        out = np.full((len(prompts), n), self.pad_id, np.int32)
        for i, p in enumerate(prompts):
            ids = [self.bos_id] + self.encode(p)[: n - 2] + [self.eos_id]
            out[i, : len(ids)] = ids
        return out
