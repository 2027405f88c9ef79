"""Tokenizer wrapper with incremental (streaming) detokenization.

Wraps a HF tokenizer; incremental decode uses the prefix-offset scheme so
multi-byte/multi-token glyphs stream correctly.
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Tuple


class Tokenizer:
    def __init__(self, hf_tokenizer):
        self.hf = hf_tokenizer

    @classmethod
    def from_path(cls, model_path: str):
        from transformers import AutoTokenizer
        return cls(AutoTokenizer.from_pretrained(model_path))

    @property
    def eos_token_id(self) -> Optional[int]:
        return self.hf.eos_token_id

    def encode(self, text: str, add_special_tokens: bool = True) -> List[int]:
        return self.hf.encode(text, add_special_tokens=add_special_tokens)

    def decode(self, ids: Sequence[int]) -> str:
        return self.hf.decode(ids, skip_special_tokens=True)

    def convert_ids_to_text(self, ids: Sequence[int]) -> str:
        return self.decode(ids)


class IncrementalDetokenizer:
    """Streams text for one sequence as tokens arrive.

    Emits only text that is stable (not part of a potentially-incomplete
    UTF-8 glyph), using the standard read-offset technique.
    """

    def __init__(self, tokenizer: Tokenizer, prompt_ids: Sequence[int]):
        self.tok = tokenizer
        self.ids: List[int] = list(prompt_ids)
        self.prefix_offset = max(len(self.ids) - 6, 0)
        self.read_offset = len(self.ids)

    def push(self, token_ids: Sequence[int]) -> str:
        self.ids.extend(token_ids)
        prefix = self.tok.hf.decode(self.ids[self.prefix_offset:self.read_offset],
                                    skip_special_tokens=True)
        full = self.tok.hf.decode(self.ids[self.prefix_offset:],
                                  skip_special_tokens=True)
        if len(full) > len(prefix) and not full.endswith("�"):
            new_text = full[len(prefix):]
            self.prefix_offset = self.read_offset
            self.read_offset = len(self.ids)
            return new_text
        return ""
