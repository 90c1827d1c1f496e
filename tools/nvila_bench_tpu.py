"""JAX-native NVILA verifier at NVILA-Lite-2B scale on TPU (synthetic int8).

Measures the new `models/nvila` stack (SigLIP-SO400M tower + flat_square
projector + Qwen2.5-1.5B LM) on hardware, at the real checkpoint's shapes
(`Efficient-Large-Model/NVILA-Lite-2B-Verifier`, loaded by the reference at
`/root/reference/tts/verifiers/nvila_verifier.py:4-10`):

  * one batched yes/no score pass over n candidates at 448 px — the
    reference loops candidates serially through torch `generate_content`
    (`tts_reflectionflow.py:158-165`); here they are ONE jitted batch, and
  * (`co` arg) the co-residency claim: an int8 NVILA is ~2.6 GB, small
    enough to live NEXT TO the 11.9 GB W8A8 FLUX DiT on one 16 GB v5e —
    unlike the 9.3 GB Qwen-7B verifier which needs a second chip or a
    per-round swap (tools/qwen_bench_tpu.py). Verified by building the
    full W8A8 DiT alongside and re-running the score pass.

Weights are synthetic but built + quantized through the SAME path the real
verifier uses (`siglip_init`/`qwen lm init` -> `ops.quant.quantize_dit_params`,
exactly `NvilaJaxVerifier.__init__`'s recipe).

Usage: python tools/nvila_bench_tpu.py [n_candidates] [px] [co|tiny]
Prints one JSON line.
"""

import json
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np


class _StubTokenizer:
    """Deterministic whitespace tokenizer (no tokenizer files on this host);
    ids only steer which embedding rows are gathered — fine for perf."""

    def encode(self, text, add_special_tokens=False):
        import zlib

        return [zlib.crc32(w.encode()) % 150000 for w in text.split()] or [7]


def nvila_lite_2b_configs():
    """The real checkpoint's shapes: SigLIP-SO400M-patch14-448 tower +
    Qwen2.5-1.5B LM (the NVILA-Lite-2B-Verifier `llm/`)."""
    from reflectionflow_tpu.config import QwenLMConfig, SiglipVisionConfig

    vis_cfg = SiglipVisionConfig()  # defaults = SO400M
    lm_cfg = QwenLMConfig(
        vocab_size=151936, hidden_size=1536, intermediate_size=8960,
        num_layers=28, num_heads=12, num_kv_heads=2, head_dim=128,
        rope_theta=1000000.0, mrope_section=(64, 0, 0), tie_word_embeddings=True,
    )
    return vis_cfg, lm_cfg


def build_synthetic_nvila(vis_cfg, lm_cfg, downsample: int, quantize: bool):
    from reflectionflow_tpu.config import NvilaConfig
    from reflectionflow_tpu.models.nvila.model import NvilaModel
    from reflectionflow_tpu.models.nvila.siglip import siglip_init
    from reflectionflow_tpu.models.qwen_vl.lm import qwen_lm_init

    vis_params = siglip_init(jax.random.PRNGKey(1), vis_cfg, dtype=jnp.bfloat16)
    lm_params = qwen_lm_init(jax.random.PRNGKey(2), lm_cfg, dtype=jnp.bfloat16)
    proj_in = vis_cfg.hidden_size * downsample * downsample
    k1, k2 = jax.random.split(jax.random.PRNGKey(3))
    proj_params = {
        "ln": {"scale": jnp.ones((proj_in,), jnp.bfloat16), "bias": jnp.zeros((proj_in,), jnp.bfloat16)},
        "fc1": {"w": (jax.random.normal(k1, (proj_in, lm_cfg.hidden_size)) * proj_in**-0.5).astype(jnp.bfloat16),
                "b": jnp.zeros((lm_cfg.hidden_size,), jnp.bfloat16)},
        "fc2": {"w": (jax.random.normal(k2, (lm_cfg.hidden_size, lm_cfg.hidden_size)) * lm_cfg.hidden_size**-0.5).astype(jnp.bfloat16),
                "b": jnp.zeros((lm_cfg.hidden_size,), jnp.bfloat16)},
    }
    if quantize:
        from reflectionflow_tpu.ops.quant import quantize_dit_params

        lm_params = dict(
            lm_params, blocks=quantize_dit_params({"b": lm_params["blocks"]}, min_size=1 << 18)["b"]
        )
        vis_params = dict(
            vis_params, blocks=quantize_dit_params({"b": vis_params["blocks"]}, min_size=1 << 18)["b"]
        )
    return NvilaModel(
        vis_params=vis_params, proj_params=proj_params, lm_params=lm_params,
        vis_cfg=vis_cfg, lm_cfg=lm_cfg,
        cfg=NvilaConfig(select_layer=-2, downsample=downsample),
        tokenizer=_StubTokenizer(),
    )


def tree_bytes(t) -> int:
    return sum(x.nbytes for x in jax.tree.leaves(t))


def main():
    n_cand = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    px = int(sys.argv[2]) if len(sys.argv) > 2 else 448
    mode = sys.argv[3] if len(sys.argv) > 3 else ""

    from reflectionflow_tpu.config import QwenLMConfig, SiglipVisionConfig

    if mode == "tiny":
        # CPU smoke of the exact same code path (validate before TPU time)
        jax.config.update("jax_platforms", "cpu")
        vis_cfg = SiglipVisionConfig.tiny()
        lm_cfg = QwenLMConfig(
            vocab_size=150001, hidden_size=64, intermediate_size=128, num_layers=2,
            num_heads=4, num_kv_heads=2, head_dim=16, mrope_section=(8, 0, 0),
            tie_word_embeddings=True,
        )
        px = vis_cfg.image_size
    else:
        vis_cfg, lm_cfg = nvila_lite_2b_configs()

    from bench import measure_rtt  # tunnel-aware timing helper
    from reflectionflow_tpu.verifiers.nvila import NvilaJaxVerifier

    rtt = measure_rtt()
    t0 = time.perf_counter()
    model = build_synthetic_nvila(vis_cfg, lm_cfg, downsample=3, quantize=mode != "tiny")
    nvila_gb = (tree_bytes(model.vis_params) + tree_bytes(model.lm_params)
                + tree_bytes(model.proj_params)) / 2**30
    float(np.asarray(jnp.sum(model.proj_params["fc2"]["b"].astype(jnp.float32))))  # force materialization
    t_init = time.perf_counter() - t0

    verifier = NvilaJaxVerifier(model=model)
    rng = np.random.default_rng(0)
    imgs = [rng.integers(0, 255, (px, px, 3), dtype=np.uint8) for _ in range(n_cand)]
    prompts = [f"does the image show object {i}? answer yes or no" for i in range(n_cand)]

    t0 = time.perf_counter()
    out = verifier.score(imgs, prompts)  # compile + warmup
    t_compile = time.perf_counter() - t0
    assert len(out) == n_cand and all(o["label"] in ("yes", "no") for o in out), out
    t0 = time.perf_counter()
    out = verifier.score(imgs, prompts)
    t_score = max(time.perf_counter() - t0 - rtt, 0.0)

    scale_desc = (
        "tiny CPU smoke" if mode == "tiny"
        else "NVILA-Lite-2B scale (SigLIP-SO400M + Qwen2.5-1.5B), synthetic weights "
        "quantized via the verifier's own int8 path"
    )
    result = {
        "config": f"{scale_desc}, {n_cand} candidates @ {px}px",
        "nvila_weights_gb": round(nvila_gb, 2),
        "t_init_s": round(t_init, 2),
        "t_compile_s": round(t_compile, 2),
        "verify_batch_s": round(t_score, 3),
        "verify_per_candidate_s": round(t_score / n_cand, 4),
        "tunnel_rtt_s": round(rtt, 3),
        "device": str(jax.devices()[0]),
    }

    if mode == "co":
        # co-residency: full W8A8 FLUX DiT (11.9 GB) next to the int8 NVILA
        from bench import init_int8_on_device
        from reflectionflow_tpu.config import FluxDiTConfig

        t0 = time.perf_counter()
        dit = init_int8_on_device(FluxDiTConfig())
        dit_gb = tree_bytes(dit) / 2**30
        # serial device queue: fetching one value drains every pending init
        float(np.asarray(jnp.sum(dit["final_proj"]["b"].astype(jnp.float32))))
        t_dit = time.perf_counter() - t0
        t0 = time.perf_counter()
        out2 = verifier.score(imgs, prompts)  # no recompile: same signature
        t_score_co = max(time.perf_counter() - t0 - rtt, 0.0)
        assert [o["label"] for o in out] == [o["label"] for o in out2]
        result.update({
            "co_resident_dit_gb": round(dit_gb, 2),
            "co_resident_total_gb": round(dit_gb + nvila_gb, 2),
            "t_dit_init_s": round(t_dit, 2),
            "verify_batch_s_with_dit_resident": round(t_score_co, 3),
        })
    print(json.dumps(result))


if __name__ == "__main__":
    main()
