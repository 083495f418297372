"""Tokenizer adapters.

HFTokenizerAdapter wraps a transformers tokenizer behind the framework's
Tokenizer contract, including the single-token streaming decode with the
SentencePiece leading-space fix (reference: hydrainfer/model/llava.py:160-166)
and chat templating.
"""
from typing import List

from .factory import Tokenizer


class HFTokenizerAdapter(Tokenizer):
    def __init__(self, hf_tokenizer, chat_template: str = None):
        self.tok = hf_tokenizer
        if chat_template is not None:
            self.tok.chat_template = chat_template

    def encode(self, prompt: str) -> List[int]:
        return self.tok.encode(prompt)

    def decode(self, token_id: int) -> str:
        tid = int(token_id)
        if tid in (self.tok.all_special_ids or []):
            return ""
        token = self.tok.convert_ids_to_tokens(tid)
        text = self.tok.convert_tokens_to_string([token])
        # SentencePiece strips the word-boundary marker when a token is
        # decoded alone; restore the leading space it encodes.
        if isinstance(token, str) and token.startswith("▁") and not text.startswith(" "):
            text = " " + text
        return text

    def apply_chat_template(self, messages: List[dict]) -> str:
        return self.tok.apply_chat_template(
            messages, tokenize=False, add_generation_prompt=True)


class SimpleTokenizer(Tokenizer):
    """Deterministic weightless tokenizer for engine tests and the fake
    factory: one token per unicode codepoint, offset past special ids."""

    OFFSET = 10

    def __init__(self, image_token: str = "<image>", image_token_id: int = 9,
                 eos_token_id: int = 2):
        self.image_token = image_token
        self.image_token_id = image_token_id
        self.eos_token_id = eos_token_id

    def encode(self, prompt: str) -> List[int]:
        ids: List[int] = []
        rest = prompt
        while rest:
            if rest.startswith(self.image_token):
                ids.append(self.image_token_id)
                rest = rest[len(self.image_token):]
            else:
                ids.append(ord(rest[0]) + self.OFFSET)
                rest = rest[1:]
        return ids

    def decode(self, token_id: int) -> str:
        tid = int(token_id)
        if tid < self.OFFSET:
            return ""
        return chr(tid - self.OFFSET)

    def apply_chat_template(self, messages: List[dict]) -> str:
        parts = [f"{m['role']}: {m['content']}" for m in messages]
        return "\n".join(parts) + "\nassistant:"
