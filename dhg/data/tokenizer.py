"""Character tokenizer for handwriting prompts.

Parity with the reference Tokenizer (tokenizer.py:7-40):
  * charset "_" + ascii_letters + digits + ".?!,'\"- " (71 chars) -> ids 2..72;
  * id 0 = padding, id 1 = end-of-sentence;
  * unknown characters map to id 2 ("_");
  * encode() appends EOS; vocab_size = 73.

Adds a vectorized batch path (encode_batch) that emits fixed-width int32
arrays directly, since the TPU pipeline wants pre-padded static shapes.
"""

from __future__ import annotations

import string

import numpy as np

CHARSET = "_" + string.ascii_letters + string.digits + ".?!,'\"- "
PAD_ID = 0
EOS_ID = 1
UNK_ID = 2  # '_'


class Tokenizer:
    def __init__(self):
        self.text = CHARSET
        self.tokens = {c: i + 2 for i, c in enumerate(CHARSET)}
        self.chars = {i + 2: c for i, c in enumerate(CHARSET)}
        self.chars[PAD_ID] = " "
        self.chars[EOS_ID] = "<end>"
        self.vocab_size = len(CHARSET) + 2

        # Dense uint8 lookup table for vectorized encoding.
        self._lut = np.full(256, UNK_ID, dtype=np.int32)
        for c, t in self.tokens.items():
            self._lut[ord(c)] = t

    def encode(self, text: str) -> list[int]:
        """Encode a string to token ids, appending EOS."""
        return [self.tokens.get(c, UNK_ID) for c in text] + [EOS_ID]

    def encode_padded(self, text: str, max_len: int) -> np.ndarray:
        """Encode and zero-pad to max_len (int32). Requires len(text)+1 <= max_len."""
        ids = self.encode(text)
        if len(ids) > max_len:
            raise ValueError(f"text too long: {len(ids)} > {max_len}")
        out = np.zeros(max_len, dtype=np.int32)
        out[: len(ids)] = ids
        return out

    def encode_batch(self, texts: list[str], max_len: int) -> np.ndarray:
        """Vectorized batch encode -> [B, max_len] int32.

        Matches encode() exactly: any character outside the charset —
        including non-latin-1 codepoints — maps to UNK_ID (the reference's
        tokens.get(c, UNK) semantics), never to a substitute character.
        """
        out = np.zeros((len(texts), max_len), dtype=np.int32)
        for i, t in enumerate(texts):
            # utf-32-le gives exact codepoints as a vector; >= 256 is UNK.
            codes = np.frombuffer(t.encode("utf-32-le"), dtype=np.uint32)
            ids = np.where(codes < 256, self._lut[np.minimum(codes, 255)], UNK_ID)
            if len(ids) + 1 > max_len:
                raise ValueError(f"text too long at row {i}")
            out[i, : len(ids)] = ids
            out[i, len(ids)] = EOS_ID
        return out

    def decode(self, tokens) -> str:
        return "".join(self.chars[int(t)] for t in np.asarray(tokens))
