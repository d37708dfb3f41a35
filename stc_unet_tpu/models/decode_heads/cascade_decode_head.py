"""BaseCascadeDecodeHead (≙ reference ``decode_heads/cascade_decode_head.py``).

Cascade stages consume (inputs, prev_logits); the loss path is shared with
BaseDecodeHead.
"""
from __future__ import annotations

from abc import abstractmethod

from .decode_head import BaseDecodeHead


class BaseCascadeDecodeHead(BaseDecodeHead):
    """Heads used in CascadeEncoderDecoder stages ≥ 1."""

    @abstractmethod
    def __call__(self, inputs, prev_output, train: bool = False):
        """Forward with the previous stage's logits."""
