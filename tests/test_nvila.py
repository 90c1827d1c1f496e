"""JAX-native NVILA verifier: parity oracles + bundle loader mechanics.

Oracles are independent torch compositions of the public pieces the VILA
bundle is made of (`transformers.SiglipVisionModel`, VILA's flat_square
downsample transcribed inline, `transformers.Qwen2ForCausalLM`) — the same
strategy as torch_flux_ref.py for the DiT. Reference behavior being
replaced: `/root/reference/tts/verifiers/nvila_verifier.py` +
`tts_reflectionflow.py:157-170`.
"""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from reflectionflow_tpu.config import NvilaConfig, SiglipVisionConfig
from reflectionflow_tpu.models.nvila.model import NvilaModel, downsample_tokens, projector_apply
from reflectionflow_tpu.models.nvila.siglip import siglip_apply
from reflectionflow_tpu.utils import hf_convert

from transformers import Qwen2Config, Qwen2ForCausalLM, SiglipVisionModel
from transformers import SiglipVisionConfig as HFSiglipVisionConfig


def _sd_np(model):
    return {k: v.detach().numpy() for k, v in model.state_dict().items()}


@pytest.fixture(scope="module")
def siglip_pair():
    torch.manual_seed(0)
    hf_cfg = HFSiglipVisionConfig(
        hidden_size=32, intermediate_size=64, num_hidden_layers=3,
        num_attention_heads=4, patch_size=4, image_size=24,
    )
    tower = SiglipVisionModel(hf_cfg).eval()
    cfg = SiglipVisionConfig.tiny()
    params = hf_convert.convert_siglip_state(_sd_np(tower), cfg)
    return tower, cfg, params


def test_siglip_tower_parity(siglip_pair):
    tower, cfg, params = siglip_pair
    rng = np.random.default_rng(0)
    pixels = rng.standard_normal((2, 24, 24, 3)).astype(np.float32)
    with torch.no_grad():
        out = tower(
            pixel_values=torch.from_numpy(pixels.transpose(0, 3, 1, 2)),
            output_hidden_states=True,
        )
    got_full = np.asarray(siglip_apply(params, cfg, jnp.asarray(pixels), select_layer=0))
    np.testing.assert_allclose(got_full, out.last_hidden_state.numpy(), atol=2e-5, rtol=2e-4)
    # VILA tap: hidden_states[-2] = penultimate block output, no post-LN
    got_tap = np.asarray(siglip_apply(params, cfg, jnp.asarray(pixels), select_layer=-2))
    np.testing.assert_allclose(got_tap, out.hidden_states[-2].numpy(), atol=2e-5, rtol=2e-4)


def _flat_square_torch(x: torch.Tensor, k: int) -> torch.Tensor:
    """VILA base_projector DownSampleBlock.flat_square[_3x3_fix], verbatim
    semantics: pad bottom/right to a multiple of k, then two view+permute
    merges."""
    x = x.contiguous()
    n, w, h, c = x.size()
    if w % k != 0:
        x = torch.cat([x, torch.zeros((n, k - (w % k), h, c), dtype=x.dtype)], dim=1).contiguous()
        n, w, h, c = x.size()
    if h % k != 0:
        x = torch.cat([x, torch.zeros((n, w, k - (h % k), c), dtype=x.dtype)], dim=2).contiguous()
        n, w, h, c = x.size()
    x = x.view(n, w, h // k, c * k)
    x = x.permute(0, 2, 1, 3).contiguous()
    x = x.view(n, h // k, w // k, c * k * k)
    x = x.permute(0, 2, 1, 3).contiguous()
    return x


@pytest.mark.parametrize("grid,k", [(6, 2), (6, 3), (5, 2), (4, 3)])
def test_downsample_matches_vila_flat_square(grid, k):
    rng = np.random.default_rng(1)
    tokens = rng.standard_normal((2, grid * grid, 5)).astype(np.float32)
    ref = _flat_square_torch(torch.from_numpy(tokens).view(2, grid, grid, 5), k)
    ref = ref.reshape(2, -1, ref.shape[-1]).numpy()
    got = np.asarray(downsample_tokens(jnp.asarray(tokens), k))
    np.testing.assert_allclose(got, ref, atol=1e-6)


class _StubTokenizer:
    """Deterministic text->ids; both the JAX model and the torch oracle use
    it, so ids agree without real tokenizer files."""

    def encode(self, text, add_special_tokens=False):
        return [5 + (ord(c) % 60) for c in text]


@pytest.fixture(scope="module")
def nvila_pair(siglip_pair):
    tower, vis_cfg, vis_params = siglip_pair
    torch.manual_seed(1)
    lm_hf_cfg = Qwen2Config(
        vocab_size=512, hidden_size=32, intermediate_size=64, num_hidden_layers=2,
        num_attention_heads=4, num_key_value_heads=2, rope_theta=1e6,
        tie_word_embeddings=True, attention_dropout=0.0,
    )
    lm = Qwen2ForCausalLM(lm_hf_cfg).eval()
    from reflectionflow_tpu.utils.hf_loader import qwen2_lm_config_from_json

    lm_cfg = qwen2_lm_config_from_json(lm_hf_cfg.to_dict())
    lm_params = hf_convert.convert_qwen_lm_state(_sd_np(lm), lm_cfg)

    k = 2
    C = vis_cfg.hidden_size * k * k
    torch.manual_seed(2)
    proj = torch.nn.Sequential(
        torch.nn.LayerNorm(C), torch.nn.Linear(C, 32), torch.nn.GELU(), torch.nn.Linear(32, 32)
    ).eval()
    proj_sd = {f"layers.{i + 1}.{n}": p.detach().numpy() for i, m in enumerate(proj)
               for n, p in m.state_dict().items()}
    proj_params = hf_convert.convert_nvila_projector_state(proj_sd)

    model = NvilaModel(
        vis_params=vis_params, proj_params=proj_params, lm_params=lm_params,
        vis_cfg=vis_cfg, lm_cfg=lm_cfg,
        cfg=NvilaConfig(select_layer=-2, downsample=k),
        tokenizer=_StubTokenizer(),
    )
    return model, tower, lm, proj


def test_first_token_logits_vs_torch_oracle(nvila_pair):
    model, tower, lm, proj = nvila_pair
    rng = np.random.default_rng(3)
    images = [rng.integers(0, 255, (24, 24, 3), dtype=np.uint8) for _ in range(2)]
    prompts = ["a red cube", "two dogs on a beach"]  # different lengths -> padding paths

    got = model.first_token_logits(images, prompts)

    tok = model.tokenizer
    for i in range(2):
        text = model.template.format(prompt=prompts[i])
        pre, _, post = text.partition("<image>")
        pixels = (np.asarray(images[i], np.float32) / 255.0 - 0.5) / 0.5
        with torch.no_grad():
            vis = tower(
                pixel_values=torch.from_numpy(pixels.transpose(2, 0, 1))[None],
                output_hidden_states=True,
            ).hidden_states[-2]
            g = int(round(vis.shape[1] ** 0.5))
            img_emb = proj(_flat_square_torch(vis.view(1, g, g, -1), 2).view(1, -1, vis.shape[-1] * 4))
            embed = lm.get_input_embeddings()
            pre_e = embed(torch.tensor([tok.encode(pre)]))
            post_e = embed(torch.tensor([tok.encode(post)]))
            embeds = torch.cat([pre_e, img_emb, post_e], dim=1)
            ref = lm(inputs_embeds=embeds).logits[0, -1].numpy()
        np.testing.assert_allclose(got[i], ref, atol=3e-4, rtol=3e-3)


def _save_bundle(tmp_path, nvila_pair):
    """Write the tiny models to disk in the released VILA layout."""
    from safetensors.numpy import save_file

    model, tower, lm, proj = nvila_pair
    root = tmp_path / "bundle"
    (root / "llm").mkdir(parents=True)
    (root / "vision_tower").mkdir()
    (root / "mm_projector").mkdir()
    lm.save_pretrained(root / "llm", safe_serialization=True)
    tower.save_pretrained(root / "vision_tower", safe_serialization=True)
    proj_sd = {f"layers.{i + 1}.{n}": p.detach().numpy().copy() for i, m in enumerate(proj)
               for n, p in m.state_dict().items()}
    save_file(proj_sd, str(root / "mm_projector" / "model.safetensors"))
    with open(root / "mm_projector" / "config.json", "w") as f:
        json.dump({"mm_projector_type": "mlp_downsample"}, f)
    with open(root / "config.json", "w") as f:
        json.dump({"mm_vision_select_layer": -2}, f)
    return root


def test_load_nvila_bundle_and_verifier(tmp_path, nvila_pair):
    from reflectionflow_tpu.utils.hf_loader import load_nvila
    from reflectionflow_tpu.verifiers import load_verifier

    root = _save_bundle(tmp_path, nvila_pair)
    loaded = load_nvila(str(root), dtype=jnp.float32)
    assert loaded.cfg.downsample == 2 and loaded.cfg.select_layer == -2
    # loaded tree == directly converted tree (the loader only re-routes)
    ref_model = nvila_pair[0]
    for a, b in zip(jax.tree.leaves(loaded.lm_params), jax.tree.leaves(ref_model.lm_params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    v = load_verifier("nvila_jax", model=loaded, tokenizer=_StubTokenizer())
    rng = np.random.default_rng(4)
    images = [rng.integers(0, 255, (24, 24, 3), dtype=np.uint8) for _ in range(3)]
    out = v.score(images, ["p1", "p2", "p3"])
    assert len(out) == 3
    for o in out:
        assert o["label"] in ("yes", "no") and np.isfinite(o["score"])
    # contract parity with the torch-wrapper path: same keys, ranking rule
    # (yes-first then logit) consumes these directly (verifiers/base.py)


def test_output_kind_drives_ranking_rule(nvila_pair):
    """Search loops pick the yes/no ranking from `verifier.output_kind`
    (not name matching — `nvila_jax` must rank like `nvila`)."""
    from reflectionflow_tpu.verifiers import load_verifier

    v = load_verifier("nvila_jax", model=nvila_pair[0], tokenizer=_StubTokenizer())
    assert v.output_kind == "yes_no"
    assert load_verifier("fake_nvila").output_kind == "yes_no"
    assert load_verifier("fake").output_kind == "score"


def test_nvila_jax_int8_quantize(nvila_pair):
    """quantize='int8' routes tower+LM block linears through W8A8 leaves
    while scoring still runs (16 GB chip co-residency profile)."""
    from reflectionflow_tpu.ops.quant import quantize_dit_params

    model, _, _, _ = nvila_pair
    q = NvilaModel(
        vis_params=dict(model.vis_params,
                        blocks=quantize_dit_params({"b": model.vis_params["blocks"]}, min_size=16)["b"]),
        proj_params=model.proj_params,
        lm_params=dict(model.lm_params,
                       blocks=quantize_dit_params({"b": model.lm_params["blocks"]}, min_size=16)["b"]),
        vis_cfg=model.vis_cfg, lm_cfg=model.lm_cfg, cfg=model.cfg, tokenizer=model.tokenizer,
    )
    assert "w_q" in q.lm_params["blocks"]["q"]
    rng = np.random.default_rng(5)
    img = rng.integers(0, 255, (24, 24, 3), dtype=np.uint8)
    logits = q.first_token_logits([img], ["check"])
    assert np.all(np.isfinite(logits))
    # int8 stays close to fp32 (tiny model, well-scaled weights)
    ref = model.first_token_logits([img], ["check"])
    cos = np.dot(logits[0], ref[0]) / (np.linalg.norm(logits[0]) * np.linalg.norm(ref[0]) + 1e-9)
    assert cos > 0.98, cos
