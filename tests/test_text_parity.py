"""Golden parity of the JAX T5/CLIP encoders against transformers (torch CPU)
on tiny random configs — the activation-level gate of SURVEY.md §7.3 item 1,
run hermetically with converted random weights."""

import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")

from reflectionflow_tpu.config import CLIPTextConfig, T5Config
from reflectionflow_tpu.models.flux.text import clip_text_encode, t5_encode
from reflectionflow_tpu.utils.hf_convert import convert_clip_text_state, convert_t5_state


@pytest.fixture(scope="module")
def t5_pair():
    import transformers

    cfg = T5Config.tiny()
    hf_cfg = transformers.T5Config(
        vocab_size=cfg.vocab_size,
        d_model=cfg.d_model,
        d_kv=cfg.d_kv,
        d_ff=cfg.d_ff,
        num_layers=cfg.num_layers,
        num_heads=cfg.num_heads,
        relative_attention_num_buckets=cfg.relative_attention_num_buckets,
        relative_attention_max_distance=cfg.relative_attention_max_distance,
        feed_forward_proj="gated-gelu",
        dropout_rate=0.0,
    )
    torch.manual_seed(0)
    model = transformers.T5EncoderModel(hf_cfg).eval()
    params = convert_t5_state({k: v.numpy() for k, v in model.state_dict().items()}, cfg)
    return cfg, model, params


def test_t5_parity(t5_pair):
    cfg, model, params = t5_pair
    ids = np.array([[3, 5, 7, 11, 1, 0, 0, 0], [2, 4, 6, 1, 0, 0, 0, 0]], np.int32)
    mask = (ids != 0).astype(np.int32)
    with torch.no_grad():
        ref = model(
            input_ids=torch.tensor(ids.astype(np.int64)),
            attention_mask=torch.tensor(mask.astype(np.int64)),
        ).last_hidden_state.numpy()
    ours = np.asarray(t5_encode(params, cfg, jnp.asarray(ids), jnp.asarray(mask)))
    np.testing.assert_allclose(ours, ref, atol=2e-4, rtol=2e-3)


@pytest.fixture(scope="module")
def clip_pair():
    import transformers

    cfg = CLIPTextConfig.tiny()
    hf_cfg = transformers.CLIPTextConfig(
        vocab_size=cfg.vocab_size,
        hidden_size=cfg.hidden_size,
        intermediate_size=cfg.intermediate_size,
        num_hidden_layers=cfg.num_layers,
        num_attention_heads=cfg.num_heads,
        max_position_embeddings=cfg.max_position_embeddings,
        hidden_act="quick_gelu",
        eos_token_id=cfg.eos_token_id,
        bos_token_id=0,
        pad_token_id=1,
    )
    torch.manual_seed(0)
    model = transformers.CLIPTextModel(hf_cfg).eval()
    params = convert_clip_text_state({k: v.numpy() for k, v in model.state_dict().items()}, cfg)
    return cfg, model, params


def test_clip_parity(clip_pair):
    cfg, model, params = clip_pair
    ids = np.array([[0, 5, 7, 11, 2, 2, 2, 2], [0, 9, 2, 2, 2, 2, 2, 2]], np.int32)
    with torch.no_grad():
        out = model(input_ids=torch.tensor(ids.astype(np.int64)))
        ref_h = out.last_hidden_state.numpy()
        ref_pooled = out.pooler_output.numpy()
    h, pooled = clip_text_encode(params, cfg, jnp.asarray(ids))
    np.testing.assert_allclose(np.asarray(h), ref_h, atol=2e-4, rtol=2e-3)
    np.testing.assert_allclose(np.asarray(pooled), ref_pooled, atol=2e-4, rtol=2e-3)
