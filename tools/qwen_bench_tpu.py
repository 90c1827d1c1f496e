"""Real-scale Qwen2.5-VL-7B verifier + reflector on TPU (synthetic int8).

VERDICT round-2 missing #3: the colocated verifier/reflector had only run
at tiny-config scale. This builds the FULL 7B LM (28 layers, hidden 3584,
GQA 28/4) + the full vision tower (32 layers, hidden 1280) with synthetic
int8 weights directly on device (~6.5 GB int8 LM blocks + 0.6 GB int8 vision
blocks + 1.1 GB bf16 embed + 1.1 GB bf16 lm_head ≈ 9.3 GB — fits one
16 GB v5e alone), then measures on hardware:

  * one batched VERIFIER score pass over branch x block candidates at
    448 px (the reward path: vision tower -> LM -> pooled rm_head), and
  * one batched REFLECTION decode (prefill + N-token while_loop decode).

Memory orchestration vs the 11.9 GB W8A8 DiT (documented in
docs/DEPLOYMENT.md): the two do NOT co-reside on one 16 GB chip — serving
either phase-swaps the verifier per round (upload ~9.3 GB: ~0.1-0.5 s on
production PCIe/DMA, minutes through this dev tunnel) or places the
verifier on a second chip of the slice (the reference serves it as a
separate-GPU service too, README.md:129-138; here it rides the same mesh).

Usage: python tools/qwen_bench_tpu.py [n_candidates] [decode_tokens] [px]
Prints one JSON line.
"""

import functools
import json
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

from reflectionflow_tpu.config import QwenLMConfig, QwenVLVisionConfig


@functools.partial(jax.jit, static_argnames=("n", "d_in", "d_out"))
def _stacked_int8(key, n, d_in, d_out):
    def body(i, buf):
        blk = jax.random.randint(jax.random.fold_in(key, i), (1, d_in, d_out), -127, 128, jnp.int8)
        return jax.lax.dynamic_update_slice(buf, blk, (i, 0, 0))

    return jax.lax.fori_loop(0, n, body, jnp.zeros((n, d_in, d_out), jnp.int8))


def _counterkey(key, counter):
    counter[0] += 1
    return jax.random.fold_in(key, counter[0])


def _qlin(key, counter, n, d_in, d_out, bias=True):
    """Stacked W8A8 leaf matching ops.quant.quantize_linear's layout."""
    leaf = {
        "w_q": _stacked_int8(_counterkey(key, counter), n, d_in, d_out),
        "w_scale": jnp.full((n, 1, d_out), (1.0 / np.sqrt(d_in)) / 127.0, jnp.float32),
        "act_q": jnp.zeros((n,), jnp.int8),
    }
    if bias:
        leaf["b"] = jnp.zeros((n, d_out), jnp.bfloat16)
    return leaf


def init_int8_qwen_lm(cfg: QwenLMConfig):
    key = jax.random.PRNGKey(11)
    counter = [0]
    n, H, D = cfg.num_layers, cfg.hidden_size, cfg.head_dim
    q_dim, kv_dim = cfg.num_heads * D, cfg.num_kv_heads * D
    I = cfg.intermediate_size
    ones = lambda: {"scale": jnp.ones((n, H), jnp.bfloat16)}  # noqa: E731
    blocks = {
        "ln1": ones(),
        "q": _qlin(key, counter, n, H, q_dim),
        "k": _qlin(key, counter, n, H, kv_dim),
        "v": _qlin(key, counter, n, H, kv_dim),
        "o": _qlin(key, counter, n, q_dim, H, bias=False),
        "ln2": ones(),
        "gate": _qlin(key, counter, n, H, I, bias=False),
        "up": _qlin(key, counter, n, H, I, bias=False),
        "down": _qlin(key, counter, n, I, H, bias=False),
    }
    embed = jax.random.normal(jax.random.PRNGKey(12), (cfg.vocab_size, H), jnp.bfloat16) * 0.02
    # lm_head stays bf16 (1.1 GB): qwen_lm_apply reads it densely, and the
    # reward path never touches it (return_hidden) — only decode does
    head = {"w": jax.random.normal(jax.random.PRNGKey(13), (H, cfg.vocab_size), jnp.bfloat16) * 0.02}
    return {
        "embed": embed,
        "blocks": blocks,
        "final_ln": {"scale": jnp.ones((H,), jnp.bfloat16)},
        "lm_head": head,
    }


def init_int8_qwen_vision(cfg: QwenVLVisionConfig):
    key = jax.random.PRNGKey(21)
    counter = [0]
    n, C, I = cfg.depth, cfg.hidden_size, cfg.intermediate_size
    patch_dim = 3 * cfg.temporal_patch_size * cfg.patch_size * cfg.patch_size
    merged = C * cfg.spatial_merge_size**2
    ones = lambda: {"scale": jnp.ones((n, C), jnp.bfloat16)}  # noqa: E731
    blocks = {
        "ln1": ones(),
        "qkv": _qlin(key, counter, n, C, 3 * C),
        "proj": _qlin(key, counter, n, C, C),
        "ln2": ones(),
        "gate": _qlin(key, counter, n, C, I, bias=True),
        "up": _qlin(key, counter, n, C, I, bias=True),
        "down": _qlin(key, counter, n, I, C, bias=True),
    }

    def small(k, i, o):
        return {
            "w": jax.random.normal(k, (i, o), jnp.bfloat16) * (i**-0.5),
            "b": jnp.zeros((o,), jnp.bfloat16),
        }

    return {
        "patch_embed": {"w": jax.random.normal(jax.random.PRNGKey(22), (patch_dim, C), jnp.bfloat16) * 0.02},
        "blocks": blocks,
        "merger": {
            "ln_q": {"scale": jnp.ones((C,), jnp.bfloat16)},
            "fc1": small(jax.random.PRNGKey(23), merged, merged),
            "fc2": small(jax.random.PRNGKey(24), merged, cfg.out_hidden_size),
        },
    }


from bench import measure_rtt  # noqa: E402  (tunnel-aware timing helper)


def main():
    n_cand = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    decode_tokens = int(sys.argv[2]) if len(sys.argv) > 2 else 128
    px = int(sys.argv[3]) if len(sys.argv) > 3 else 448

    from reflectionflow_tpu.models.qwen_vl.generate import QwenVLGenerator
    from reflectionflow_tpu.models.qwen_vl.model import QwenVLModel, QwenVLSpecialTokens
    from reflectionflow_tpu.models.qwen_vl.reward import RewardHead
    from reflectionflow_tpu.verifiers.qwen_verifier import QwenRewardVerifier

    if len(sys.argv) > 4 and sys.argv[4] == "tiny":
        # CPU smoke of the exact same code path (validate before TPU time)
        jax.config.update("jax_platforms", "cpu")
        lm_cfg = QwenLMConfig(
            vocab_size=152064, hidden_size=64, intermediate_size=128, num_layers=2,
            num_heads=4, num_kv_heads=2, head_dim=16, mrope_section=(4, 2, 2),
        )
        vis_cfg = QwenVLVisionConfig(
            depth=2, hidden_size=32, intermediate_size=64, num_heads=4,
            patch_size=4, temporal_patch_size=2, spatial_merge_size=2,
            window_size=8, fullatt_block_indexes=(1,), out_hidden_size=64,
        )
    else:
        lm_cfg = QwenLMConfig()
        vis_cfg = QwenVLVisionConfig()
    rtt = measure_rtt()

    t0 = time.perf_counter()
    model = QwenVLModel(
        lm_params=init_int8_qwen_lm(lm_cfg),
        vision_params=init_int8_qwen_vision(vis_cfg),
        lm_cfg=lm_cfg,
        vis_cfg=vis_cfg,
        dtype=jnp.bfloat16,
    )
    # force materialization before timing anything
    float(np.asarray(jnp.sum(model.lm_params["blocks"]["q"]["w_scale"])))
    t_init = time.perf_counter() - t0

    head = RewardHead.random_init(jax.random.PRNGKey(31), lm_cfg.hidden_size, pooling="last")
    verifier = QwenRewardVerifier(model=model, head=head, max_pixels=px * px)

    rng = np.random.default_rng(0)
    imgs = [rng.integers(0, 255, (px, px, 3), dtype=np.uint8) for _ in range(n_cand)]
    prompts = [f"a photo of object {i}" for i in range(n_cand)]

    scores = verifier.raw_scores(imgs, prompts)  # compile + warmup
    assert all(np.isfinite(s) for s in scores), scores
    t0 = time.perf_counter()
    scores = verifier.raw_scores(imgs, prompts)
    t_score = max(time.perf_counter() - t0 - rtt, 0.0)

    # --- reflection decode: batched prefill + greedy while_loop decode.
    # Hermetic ids (no tokenizer files): chat-shaped sequences with image
    # pads sized for the px grid.
    gen = QwenVLGenerator(model=model, tokenizer=None)
    toks = QwenVLSpecialTokens()
    factor = vis_cfg.patch_size * vis_cfg.spatial_merge_size
    gpx = (px // factor) * factor
    n_img = (gpx // factor) ** 2
    seqs = []
    for i in range(n_cand):
        body = rng.integers(10, 5000, 48).tolist()
        ids = np.asarray(
            [toks.im_start] + [toks.vision_start] + [toks.image_pad] * n_img + [toks.vision_end]
            + body + [toks.im_start], np.int64,
        )
        img = np.asarray(imgs[i][:gpx, :gpx])
        seqs.append((ids, [img]))
    out = gen.decode_batch(seqs, max_new_tokens=decode_tokens)  # compile + warmup
    assert len(out) == n_cand
    t0 = time.perf_counter()
    out = gen.decode_batch(seqs, max_new_tokens=decode_tokens)
    t_decode = max(time.perf_counter() - t0 - rtt, 0.0)

    print(json.dumps({
        "config": (
            f"Qwen2.5-VL-7B scale, synthetic int8 (W8A8 LM+vision blocks, bf16 embeds), "
            f"{n_cand} candidates @ {px}px, one v5e"
        ),
        "t_init_s": round(t_init, 2),
        "verify_batch_s": round(t_score, 3),
        "verify_per_candidate_s": round(t_score / n_cand, 3),
        "reflect_decode_s": round(t_decode, 3),
        "reflect_tokens": decode_tokens,
        "reflect_tokens_per_s": round(n_cand * decode_tokens / t_decode, 1),
        "tunnel_rtt_s": round(rtt, 3),
        "device": str(jax.devices()[0]),
    }))


if __name__ == "__main__":
    main()
