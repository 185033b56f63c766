"""CLIP BPE tokenizer (vocab-file-driven), replacing the byte fallback.

The reference tokenizes captions with OpenAI CLIP's byte-level BPE
(ddm/webdata.py:53,80-85 `clip.tokenize(...)`; the t2i UNet loads the CLIP
tower that consumes those ids, unet/cond_unet_t2i.py:694-698). This is a
from-scratch implementation of that public algorithm:

  * byte -> printable-unicode table (so every byte sequence is tokenizable);
  * greedy lowest-rank pair merging over a user-supplied merges file
    (CLIP ships bpe_simple_vocab_16e6.txt.gz — supply it like the weights,
    via path or ADM_TPU_CLIP_BPE);
  * the CLIP text regex (via the `regex` module), lowercasing and
    whitespace cleanup;
  * <|startoftext|> ... <|endoftext|> framing, pad-with-zeros to
    context_length 77, truncate=True semantics (the reference always
    truncates, ddm/webdata.py:53).

Note: CLIP additionally runs ftfy.fix_text; ftfy is not in this image, so
cleaning is html.unescape x2 + whitespace collapse (identical for ASCII
captions; mojibake repair is the only missing piece).
"""

from __future__ import annotations

import gzip
import html
from functools import lru_cache
from typing import Dict, List, Sequence, Tuple

import numpy as np


@lru_cache()
def bytes_to_unicode() -> Dict[int, str]:
    """Reversible byte -> unicode-char table (GPT-2/CLIP standard): keeps
    printable chars as-is and maps the rest into 256..+ codepoints."""
    bs = (
        list(range(ord("!"), ord("~") + 1))
        + list(range(ord("\xa1"), ord("\xac") + 1))
        + list(range(ord("\xae"), ord("\xff") + 1))
    )
    cs = bs[:]
    n = 0
    for b in range(256):
        if b not in bs:
            bs.append(b)
            cs.append(256 + n)
            n += 1
    return dict(zip(bs, [chr(c) for c in cs]))


def get_pairs(word: Tuple[str, ...]):
    pairs = set()
    prev = word[0]
    for ch in word[1:]:
        pairs.add((prev, ch))
        prev = ch
    return pairs


def _clean(text: str) -> str:
    import re

    text = html.unescape(html.unescape(text))
    text = re.sub(r"\s+", " ", text)
    return text.strip()


class ClipBPETokenizer:
    """CLIP's SimpleTokenizer given a merges list or bpe vocab file path."""

    def __init__(self, bpe_path: str | None = None,
                 merges: Sequence[str] | None = None,
                 context_length: int = 77):
        import regex

        self.context_length = context_length
        self.byte_encoder = bytes_to_unicode()
        if merges is None:
            if bpe_path is None:
                import os

                bpe_path = os.environ.get("ADM_TPU_CLIP_BPE")
            if bpe_path is None:
                raise ValueError(
                    "supply bpe_path / merges / ADM_TPU_CLIP_BPE (CLIP's "
                    "bpe_simple_vocab_16e6.txt.gz)"
                )
            opener = gzip.open if str(bpe_path).endswith(".gz") else open
            with opener(bpe_path, "rt", encoding="utf-8") as f:
                lines = f.read().split("\n")
            # CLIP skips the header line and caps at 48894+1 entries
            merges = lines[1 : 49152 - 256 - 2 + 1]
        merge_pairs: List[Tuple[str, str]] = [
            tuple(m.split()) for m in merges if m
        ]
        vocab = list(bytes_to_unicode().values())
        vocab = vocab + [v + "</w>" for v in vocab]
        for m in merge_pairs:
            vocab.append("".join(m))
        vocab.extend(["<|startoftext|>", "<|endoftext|>"])
        self.encoder = {tok: i for i, tok in enumerate(vocab)}
        self.decoder = {i: tok for tok, i in self.encoder.items()}
        self.bpe_ranks = {m: i for i, m in enumerate(merge_pairs)}
        self.cache = {
            "<|startoftext|>": "<|startoftext|>",
            "<|endoftext|>": "<|endoftext|>",
        }
        self.pat = regex.compile(
            r"""<\|startoftext\|>|<\|endoftext\|>|'s|'t|'re|'ve|'m|'ll|'d|"""
            r"""[\p{L}]+|[\p{N}]|[^\s\p{L}\p{N}]+""",
            regex.IGNORECASE,
        )

    @property
    def sot(self) -> int:
        return self.encoder["<|startoftext|>"]

    @property
    def eot(self) -> int:
        return self.encoder["<|endoftext|>"]

    def bpe(self, token: str) -> str:
        if token in self.cache:
            return self.cache[token]
        word = tuple(token[:-1]) + (token[-1] + "</w>",)
        pairs = get_pairs(word)
        if not pairs:
            return token + "</w>"
        while True:
            bigram = min(
                pairs, key=lambda p: self.bpe_ranks.get(p, float("inf"))
            )
            if bigram not in self.bpe_ranks:
                break
            first, second = bigram
            new_word: List[str] = []
            i = 0
            while i < len(word):
                try:
                    j = word.index(first, i)
                except ValueError:
                    new_word.extend(word[i:])
                    break
                new_word.extend(word[i:j])
                i = j
                if (
                    word[i] == first
                    and i < len(word) - 1
                    and word[i + 1] == second
                ):
                    new_word.append(first + second)
                    i += 2
                else:
                    new_word.append(word[i])
                    i += 1
            word = tuple(new_word)
            if len(word) == 1:
                break
            pairs = get_pairs(word)
        out = " ".join(word)
        self.cache[token] = out
        return out

    def encode(self, text: str) -> List[int]:
        ids: List[int] = []
        text = _clean(text).lower()
        for token in self.pat.findall(text):
            tok = "".join(self.byte_encoder[b] for b in token.encode("utf-8"))
            ids.extend(self.encoder[t] for t in self.bpe(tok).split(" "))
        return ids

    def __call__(self, texts: str | Sequence[str],
                 truncate: bool = True) -> np.ndarray:
        """clip.tokenize-compatible: (N, context_length) int32, zero-padded,
        <sot> ids... <eot>; truncate keeps the eot as the last token."""
        if isinstance(texts, str):
            texts = [texts]
        out = np.zeros((len(texts), self.context_length), np.int32)
        for i, text in enumerate(texts):
            ids = [self.sot] + self.encode(text) + [self.eot]
            if len(ids) > self.context_length:
                if not truncate:
                    raise RuntimeError(
                        f"input too long for context {self.context_length}"
                    )
                ids = ids[: self.context_length]
                ids[-1] = self.eot
            out[i, : len(ids)] = ids
        return out
