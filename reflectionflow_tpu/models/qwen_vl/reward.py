"""Image-Verifier reward model: Qwen2.5-VL + rm_head with three poolings.

Capability parity with `Qwen2VLRewardModelBT`
(`/root/reference/reward_modeling/trainer.py:59-172`) and the inference
wrapper (`reward_modeling/test_reward.py:36-155`):

  * rm_head = Linear(hidden, output_dim, bias=False) on pooled LM states;
  * pooling: "last" (last non-pad token), "mean" (mask-weighted), or
    "special" (positions of the appended `<|VQ_reward|>` token);
  * z-normalized scores {'VQ': (score - mean) / std} with saved stats.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import jax
import jax.numpy as jnp
import numpy as np

from .model import QwenVLModel


@dataclass
class RewardHead:
    w: jnp.ndarray  # (hidden, output_dim)
    pooling: str = "special"  # last | mean | special
    special_token_id: int | None = None
    vq_mean: float = 0.0
    vq_std: float = 1.0

    @classmethod
    def random_init(cls, key, hidden: int, output_dim: int = 1, pooling: str = "last",
                    special_token_id: int | None = None):
        return cls(
            w=jax.random.normal(key, (hidden, output_dim)) * (hidden ** -0.5),
            pooling=pooling,
            special_token_id=special_token_id,
        )


def pool_hidden(
    hidden: jnp.ndarray,  # (B, L, H)
    attention_mask: jnp.ndarray,  # (B, L) 1=valid
    pooling: str,
    input_ids: jnp.ndarray | None = None,
    special_token_id: int | None = None,
) -> jnp.ndarray:
    """-> (B, H) pooled states (semantics of trainer.py:142-167)."""
    if pooling == "mean":
        m = attention_mask[:, :, None].astype(hidden.dtype)
        return (hidden * m).sum(axis=1) / jnp.maximum(m.sum(axis=1), 1.0)
    if pooling == "last":
        last = attention_mask.sum(axis=1).astype(jnp.int32) - 1
        return hidden[jnp.arange(hidden.shape[0]), last]
    if pooling == "special":
        assert input_ids is not None and special_token_id is not None
        is_sp = (input_ids == special_token_id).astype(jnp.int32)
        # last occurrence of the special token
        idx = jnp.argmax(is_sp * jnp.arange(1, input_ids.shape[1] + 1)[None, :], axis=1)
        return hidden[jnp.arange(hidden.shape[0]), idx]
    raise ValueError(f"unknown pooling {pooling}")


class QwenRewardModel:
    """Scoring API: images + prompts -> z-normed scalar VQ scores."""

    def __init__(self, model: QwenVLModel, head: RewardHead, prompt_template=None):
        self.model = model
        self.head = head
        self.prompt_template = prompt_template or (
            lambda prompt: f"Rate the quality of the image for the prompt: {prompt}"
        )

    def score_sequence(self, input_ids: np.ndarray, images: list[np.ndarray]) -> float:
        hidden = self.model.forward_hidden(input_ids, images)
        mask = jnp.ones((1, len(input_ids)), jnp.int32)
        pooled = pool_hidden(
            hidden, mask, self.head.pooling,
            input_ids=jnp.asarray(input_ids[None]), special_token_id=self.head.special_token_id,
        )
        raw = (pooled @ self.head.w.astype(pooled.dtype))[0, 0]
        return float(raw)

    def normalized(self, raw: float) -> float:
        return (raw - self.head.vq_mean) / max(self.head.vq_std, 1e-8)
