"""CLIP BPE tokenizer: merge algorithm, framing, truncation — verified
against hand-computed expectations from the reference algorithm
(clip.tokenize semantics, used at ddm/webdata.py:53)."""

import numpy as np
import pytest

pytest.importorskip("regex")

from adm_tpu.nn.clip_tokenizer import ClipBPETokenizer, bytes_to_unicode

MERGES = ["h e", "he l", "hel l", "hell o</w>", "w o", "wo r", "wor l",
          "worl d</w>"]


def _tok(**kw):
    return ClipBPETokenizer(merges=MERGES, context_length=10, **kw)


def test_bytes_to_unicode_bijective():
    table = bytes_to_unicode()
    assert len(table) == 256
    assert len(set(table.values())) == 256
    assert table[ord("a")] == "a"  # printable bytes map to themselves


def test_greedy_merge_order():
    tok = _tok()
    # (h,e)->(he,l)->(hel,l)->(hell,o</w>)->hello</w>: one token
    assert tok.bpe("hello") == "hello</w>"
    assert tok.encode("hello") == [tok.encoder["hello</w>"]]
    # unseen word: merges apply partially, rest stays char-level
    assert tok.bpe("help") == "hel p</w>"


def test_cleaning_and_lowercasing():
    tok = _tok()
    a = tok.encode("  Hello\tWORLD ")
    b = tok.encode("hello world")
    assert a == b
    assert a == [tok.encoder["hello</w>"], tok.encoder["world</w>"]]


def test_framing_padding_truncation():
    tok = _tok()
    out = tok(["hello world"])
    assert out.shape == (1, 10)
    row = out[0]
    assert row[0] == tok.sot
    assert row[3] == tok.eot
    assert (row[4:] == 0).all()
    # truncate=True keeps eot as the final token (clip.tokenize(truncate=True))
    long = tok(["hello " * 30], truncate=True)[0]
    assert long[0] == tok.sot and long[-1] == tok.eot
    with pytest.raises(RuntimeError):
        tok(["hello " * 30], truncate=False)


def test_contractions_and_punctuation_split():
    tok = _tok()
    ids = tok.encode("hello's, world")
    # regex splits into: hello | 's | , | world
    toks = [tok.decoder[i] for i in ids]
    assert toks[0] == "hello</w>"
    assert "".join(toks[1:3]).replace("</w>", "") == "'s"
    assert toks[-1] == "world</w>"


def test_vocab_size_matches_clip_layout():
    """256 bytes + 256 byte</w> + merges + 2 specials (CLIP's layout, so ids
    line up with the real 49408 vocab when the real merges file is used)."""
    tok = _tok()
    assert len(tok.encoder) == 256 + 256 + len(MERGES) + 2
    assert tok.eot == tok.sot + 1


def test_webdata_uses_clip_tokenizer_when_vocab_set(tmp_path, monkeypatch):
    vocab = tmp_path / "bpe_vocab.txt"
    vocab.write_text("#version header\n" + "\n".join(MERGES) + "\n")
    monkeypatch.setenv("ADM_TPU_CLIP_BPE", str(vocab))
    from adm_tpu.nn.clip_tokenizer import ClipBPETokenizer

    tok = ClipBPETokenizer(context_length=77)
    assert tok.bpe("hello") == "hello</w>"
