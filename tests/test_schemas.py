"""Pin the per-GenEval-tag grading axes to the reference's field names.

The axis names are an artifact contract: they key `best_img_detailedscore.jsonl`
entries and `choice_of_metric` lookups, and must match the reference's
pydantic schemas verbatim (/root/reference/tts/verifiers/openai_verifier.py:27-69).
"""

from reflectionflow_tpu.verifiers.schemas import axes_for_tag, schema_for_tag

REFERENCE_AXES = {
    None: [
        "accuracy_to_prompt", "creativity_and_originality",
        "visual_quality_and_realism", "consistency_and_cohesion",
        "emotional_or_thematic_resonance", "overall_score",
    ],
    "single_object": ["object_completeness", "detectability", "occlusion_handling", "overall_score"],
    "two_object": ["separation_clarity", "individual_completeness", "relationship_accuracy", "overall_score"],
    "counting": ["count_accuracy", "object_uniformity", "spatial_legibility", "overall_score"],
    "colors": ["color_fidelity", "contrast_effectiveness", "multi_object_consistency", "overall_score"],
    "position": ["position_accuracy", "occlusion_management", "perspective_consistency", "overall_score"],
    "color_attr": ["attribute_binding", "contrast_effectiveness", "material_consistency", "overall_score"],
}


def test_tag_axes_match_reference():
    for tag, axes in REFERENCE_AXES.items():
        assert axes_for_tag(tag) == axes, tag
    # every schema scores each axis as {score, explanation}
    for tag in REFERENCE_AXES:
        sub = schema_for_tag(tag).model_fields["overall_score"].annotation
        assert list(sub.model_fields) == ["score", "explanation"]


def test_unknown_tag_falls_back_to_generic():
    assert axes_for_tag("not_a_geneval_tag") == REFERENCE_AXES[None]
