from .lm import qwen_lm_apply, qwen_lm_init  # noqa: F401
from .vision import qwen_vision_apply, qwen_vision_init  # noqa: F401


def load_generator(model_path: str | None, **kw):
    from .generate import QwenVLGenerator

    return QwenVLGenerator.from_pretrained(model_path, **kw)
