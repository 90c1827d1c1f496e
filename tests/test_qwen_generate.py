"""Reflection generator decode loop (KV cache greedy decode, multimodal)."""

import jax
import jax.numpy as jnp
import numpy as np

from reflectionflow_tpu.models.qwen_vl.generate import QwenVLGenerator
from reflectionflow_tpu.models.qwen_vl.model import QwenVLModel


class _StubTokenizer:
    def encode(self, text, add_special_tokens=False):
        return [5 + (ord(c) % 50) for c in text[:8]]

    def decode(self, ids, skip_special_tokens=True):
        return " ".join(str(i) for i in ids)


def test_decode_ids_greedy_deterministic():
    model = QwenVLModel.random_init(jax.random.PRNGKey(0), dtype=jnp.float32)
    gen = QwenVLGenerator(model=model, tokenizer=_StubTokenizer(), eos_token_id=-1, max_len=64)
    rng = np.random.default_rng(0)
    img = rng.integers(0, 255, (16, 16, 3), dtype=np.uint8)
    n_img = 4  # 16px/patch4 -> grid 4x4 -> merge 2 -> 4 tokens
    ids = np.concatenate([[7], [151652], [151655] * n_img, [151653], [9, 11]]).astype(np.int64)
    out1 = gen.decode_ids(ids, [img], max_new_tokens=5)
    out2 = gen.decode_ids(ids, [img], max_new_tokens=5)
    assert out1 == out2
    assert 1 <= len(out1) <= 5
    assert all(0 <= t < model.lm_cfg.vocab_size for t in out1)
    # sampled decode differs from greedy with high probability at temp>0
    out3 = gen.decode_ids(ids, [img], max_new_tokens=5, temperature=2.0, key=jax.random.PRNGKey(42))
    assert isinstance(out3, list)


def test_generate_builds_chat_and_decodes():
    model = QwenVLModel.random_init(jax.random.PRNGKey(0), dtype=jnp.float32)
    gen = QwenVLGenerator(model=model, tokenizer=_StubTokenizer(), eos_token_id=-1)
    rng = np.random.default_rng(1)
    imgs = [rng.integers(0, 255, (16, 16, 3), dtype=np.uint8)]
    outs = gen.generate(imgs, ["make it better"], max_new_tokens=4)
    assert len(outs) == 1 and isinstance(outs[0], str) and outs[0]


def test_decode_batch_matches_per_row():
    """Ragged left-padded batch decode == independent per-row decodes
    (mixed sequence lengths AND mixed vision grids in one batch)."""
    model = QwenVLModel.random_init(jax.random.PRNGKey(0), dtype=jnp.float32)
    gen = QwenVLGenerator(model=model, tokenizer=_StubTokenizer(), eos_token_id=-1, max_len=64)
    rng = np.random.default_rng(2)

    def seq(img_px, extra_text):
        img = rng.integers(0, 255, (img_px, img_px, 3), dtype=np.uint8)
        grid_tokens = (img_px // 8) ** 2  # patch 4, merge 2
        ids = np.concatenate(
            [[7], [151652], [151655] * grid_tokens, [151653], [9] * extra_text]
        ).astype(np.int64)
        return ids, [img]

    seqs = [seq(16, 2), seq(16, 7), seq(24, 3)]  # two same-grid rows + one odd grid
    batched = gen.decode_batch(seqs, max_new_tokens=6)
    singles = [gen.decode_batch([s], max_new_tokens=6)[0] for s in seqs]
    assert batched == singles, (batched, singles)
