"""Tokenizer parity (reference tokenizer.py:7-40)."""

import numpy as np
import pytest

from dhg.data.tokenizer import EOS_ID, PAD_ID, UNK_ID, Tokenizer


def test_vocab_size():
    assert Tokenizer().vocab_size == 73


def test_encode_appends_eos():
    tok = Tokenizer()
    ids = tok.encode("ab")
    assert ids[-1] == EOS_ID
    assert len(ids) == 3


def test_charset_ids():
    tok = Tokenizer()
    assert tok.encode("_")[0] == 2
    assert tok.encode("a")[0] == 3  # '_' then ascii_letters
    assert tok.encode("A")[0] == 3 + 26
    assert tok.encode("0")[0] == 3 + 52


def test_unknown_maps_to_underscore():
    tok = Tokenizer()
    assert tok.encode("~")[0] == UNK_ID


def test_decode_roundtrip():
    tok = Tokenizer()
    text = "Hello World, it's 42!"
    ids = tok.encode(text)
    assert tok.decode(ids[:-1]) == text


def test_encode_padded():
    tok = Tokenizer()
    out = tok.encode_padded("hi", 10)
    assert out.dtype == np.int32
    assert list(out[:3]) == tok.encode("hi")
    assert all(out[3:] == PAD_ID)
    with pytest.raises(ValueError):
        tok.encode_padded("x" * 10, 10)


def test_encode_batch_matches_scalar():
    tok = Tokenizer()
    texts = ["Hello", "a b-c?", '"quote" it.']
    batch = tok.encode_batch(texts, 20)
    for i, t in enumerate(texts):
        assert list(batch[i]) == list(tok.encode_padded(t, 20))


def test_encode_batch_matches_encode_for_non_latin_chars():
    """Batched and single-prompt paths must tokenize identically: characters
    outside the charset — including non-latin-1 codepoints — map to UNK_ID,
    never to a substitute '?' token (tokens.get(c, UNK) semantics)."""
    from dhg.data.tokenizer import Tokenizer

    tok = Tokenizer()
    prompts = ["héllo", "日本語 ok", "a—dash?", "plain text!"]
    batch = tok.encode_batch(prompts, max_len=20)
    for i, p in enumerate(prompts):
        single = tok.encode(p)
        np.testing.assert_array_equal(batch[i, : len(single)], single)
        assert np.all(batch[i, len(single) :] == 0)
