"""Structured-output grading schemas (pydantic).

Key-compatible with the reference's per-GenEval-tag schemas
(`/root/reference/tts/verifiers/openai_verifier.py:27-69`) so downstream
JSONL artifacts and `choice_of_metric` lookups match.
"""

from __future__ import annotations

from pydantic import BaseModel


class Score(BaseModel):
    score: int
    explanation: str


class Grading(BaseModel):
    accuracy_to_prompt: Score
    creativity_and_originality: Score
    visual_quality_and_realism: Score
    consistency_and_cohesion: Score
    emotional_or_thematic_resonance: Score
    overall_score: Score


class GradingSingleObject(BaseModel):
    object_completeness: Score
    detectability: Score
    occlusion_handling: Score
    overall_score: Score


class GradingTwoObject(BaseModel):
    separation_clarity: Score
    individual_completeness: Score
    relationship_accuracy: Score
    overall_score: Score


class GradingCounting(BaseModel):
    count_accuracy: Score
    object_uniformity: Score
    spatial_legibility: Score
    overall_score: Score


class GradingColors(BaseModel):
    color_fidelity: Score
    contrast_effectiveness: Score
    multi_object_consistency: Score
    overall_score: Score


class GradingPosition(BaseModel):
    position_accuracy: Score
    occlusion_management: Score
    perspective_consistency: Score
    overall_score: Score


class GradingColorAttr(BaseModel):
    attribute_binding: Score
    contrast_effectiveness: Score
    material_consistency: Score
    overall_score: Score


TAG_SCHEMAS: dict[str | None, type[BaseModel]] = {
    None: Grading,
    "single_object": GradingSingleObject,
    "two_object": GradingTwoObject,
    "counting": GradingCounting,
    "colors": GradingColors,
    "position": GradingPosition,
    "color_attr": GradingColorAttr,
}


def schema_for_tag(tag: str | None) -> type[BaseModel]:
    return TAG_SCHEMAS.get(tag, Grading)


def axes_for_tag(tag: str | None) -> list[str]:
    return list(schema_for_tag(tag).model_fields.keys())
