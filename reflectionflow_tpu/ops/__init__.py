from .attention import joint_attention, sdpa, set_ring_context  # noqa: F401
from .norms import adaln_modulate, layer_norm, rms_norm  # noqa: F401
