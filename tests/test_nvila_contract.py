"""NvilaVerifier wrapper contract against a stubbed `generate_content`.

The real NVILA weights (`trust_remote_code`) never load in CI; this pins
the wrapper's API assumptions — input assembly ([PIL image, prompt]),
(response, scores) unpacking, yes/no logit read — so a transformers-side
drift fails here instead of at deployment (VERDICT round 2, weak #4).
Scoring convention: `/root/reference/tts/tts_reflectionflow.py:157-170`.
"""

import numpy as np
import pytest

from reflectionflow_tpu.verifiers.nvila import NvilaVerifier

YES_ID, NO_ID = 7, 9


class StubScores:
    """Minimal tensor stand-in supporting scores[0][0, id] -> float."""

    def __init__(self, row):
        self._row = row

    def __getitem__(self, key):
        b, tid = key
        assert b == 0
        return self._row[tid]


class StubModel:
    def __init__(self, answers):
        self.answers = list(answers)
        self.calls = []

    def generate_content(self, content):
        self.calls.append(content)
        resp, yes_logit, no_logit = self.answers.pop(0)
        row = {YES_ID: yes_logit, NO_ID: no_logit}
        return resp, [StubScores(row)]


def _verifier(answers):
    v = NvilaVerifier.__new__(NvilaVerifier)  # skip weight loading
    v.model = StubModel(answers)
    v.yes_id, v.no_id = YES_ID, NO_ID
    return v


def test_score_reads_label_matched_logit():
    v = _verifier([("yes", 3.5, -1.0), ("no", 0.25, 2.0)])
    imgs = [np.zeros((8, 8, 3), np.uint8)] * 2
    out = v.score(imgs, ["a cat", "a dog"])
    assert out[0] == {"label": "yes", "score": 3.5}  # yes -> yes-logit
    assert out[1] == {"label": "no", "score": 2.0}  # no -> NO-logit, not yes


def test_input_assembly_is_pil_then_prompt():
    from PIL import Image

    v = _verifier([("yes", 1.0, 0.0)])
    v.score([np.full((4, 4, 3), 7, np.uint8)], ["prompt text"])
    [call] = v.model.calls
    assert isinstance(call[0], Image.Image) and call[1] == "prompt text"
    assert call[0].size == (4, 4)


def test_nvila_ranking_rule_consumes_wrapper_output():
    """The yes-first ranking (verifiers.base) orders the wrapper's dicts the
    way the reference sorts: all yes (by logit desc) before all no (by
    logit asc)."""
    from reflectionflow_tpu.verifiers.base import RankingRule, select_topk

    outs = [
        {"label": "no", "score": 0.1},
        {"label": "yes", "score": 2.0},
        {"label": "no", "score": 5.0},
        {"label": "yes", "score": 9.0},
    ]
    assert select_topk(outs, 4, RankingRule(kind="yes_no")) == [3, 1, 0, 2]


def test_results_keep_input_order_and_length():
    v = _verifier([("yes", 1.0, 0.0), ("no", 0.0, 1.0), ("yes", 2.0, 0.0)])
    out = v.score([np.zeros((4, 4, 3), np.uint8)] * 3, list("abc"))
    assert [o["label"] for o in out] == ["yes", "no", "yes"]
