"""Strict/Relaxed scenario classification (reference: hydrainfer/engine/scenario.py:14-16).

Short-prompt short-output requests are latency-critical (Strict) and are
routed to migration targets with tighter TPOT SLOs.
"""
from enum import IntEnum


class ScenarioType(IntEnum):
    Relaxed = 0
    Strict = 1

    def __str__(self):
        return self.name


class ScenarioClassifier:
    def __init__(self, text_token_threshold: int = 100,
                 output_token_threshold: int = 100):
        self.text_token_threshold = text_token_threshold
        self.output_token_threshold = output_token_threshold

    def classify(self, n_text_tokens: int, n_output_tokens: int) -> ScenarioType:
        if (n_text_tokens < self.text_token_threshold
                and n_output_tokens < self.output_token_threshold):
            return ScenarioType.Strict
        return ScenarioType.Relaxed
