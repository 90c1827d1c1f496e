from .attention import joint_attention, sdpa  # noqa: F401
from .norms import adaln_modulate, layer_norm, rms_norm  # noqa: F401
