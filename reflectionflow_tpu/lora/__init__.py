from .lora import (  # noqa: F401
    corrector_target_paths,
    fold_lora,
    lora_init,
    lora_param_count,
    make_dit_param_views,
)
