"""Int8 weight-only quantization tests."""

import jax
import jax.numpy as jnp
import numpy as np

from reflectionflow_tpu.config import FluxDiTConfig
from reflectionflow_tpu.models.flux.dit import flux_dit_apply, flux_dit_init, linear
from reflectionflow_tpu.models.flux.rope import make_image_ids, make_text_ids
from reflectionflow_tpu.ops.quant import quantize_dit_params, quantize_linear
from reflectionflow_tpu.utils.tree import tree_bytes


def test_quantize_linear_roundtrip(key):
    p = {"w": jax.random.normal(key, (64, 32)), "b": jnp.zeros((32,))}
    q = quantize_linear(p)
    assert q["w_q"].dtype == jnp.int8
    x = jax.random.normal(jax.random.PRNGKey(1), (4, 64))
    ref = linear(p, x)
    out = linear(q, x)
    # per-channel int8: relative error ~1%
    rel = float(jnp.abs(out - ref).max() / jnp.abs(ref).max())
    assert rel < 0.02, rel


def test_quantize_dit_shrinks_and_stays_close(key):
    cfg = FluxDiTConfig.tiny()
    params = flux_dit_init(key, cfg)
    qparams = quantize_dit_params(params, min_size=64 * 64)  # quantize most mats
    assert tree_bytes(qparams) < tree_bytes(params) * 0.6
    inputs = dict(
        img=jax.random.normal(jax.random.PRNGKey(1), (1, 16, cfg.in_channels)),
        txt=jax.random.normal(jax.random.PRNGKey(2), (1, 8, cfg.text_dim)),
        pooled=jax.random.normal(jax.random.PRNGKey(3), (1, cfg.pooled_dim)),
        timestep=jnp.array([0.5]),
        img_ids=jnp.asarray(make_image_ids(4, 4)),
        txt_ids=jnp.asarray(make_text_ids(8)),
        guidance=jnp.array([3.5]),
    )
    ref = flux_dit_apply(params, cfg, **inputs)
    out = flux_dit_apply(qparams, cfg, **inputs)
    err = float(jnp.abs(out - ref).mean() / jnp.abs(ref).mean())
    assert err < 0.05, err


def test_quantize_skips_small(key):
    cfg = FluxDiTConfig.tiny()
    params = flux_dit_init(key, cfg)
    q = quantize_dit_params(params, min_size=1 << 30)  # nothing qualifies
    assert "w" in q["img_in"]


def test_fuse_qkv_matches(key):
    from reflectionflow_tpu.ops.fuse import fuse_dit_qkv

    cfg = FluxDiTConfig.tiny()
    params = flux_dit_init(key, cfg)
    fused = fuse_dit_qkv(params)
    assert "qkv" in fused["double_blocks"]["attn"]
    assert "q" not in fused["double_blocks"]["attn"]
    inputs = dict(
        img=jax.random.normal(jax.random.PRNGKey(1), (1, 16, cfg.in_channels)),
        txt=jax.random.normal(jax.random.PRNGKey(2), (1, 8, cfg.text_dim)),
        pooled=jax.random.normal(jax.random.PRNGKey(3), (1, cfg.pooled_dim)),
        timestep=jnp.array([0.5]),
        img_ids=jnp.asarray(make_image_ids(4, 4)),
        txt_ids=jnp.asarray(make_text_ids(8)),
        guidance=jnp.array([3.5]),
    )
    ref = flux_dit_apply(params, cfg, **inputs)
    out = flux_dit_apply(fused, cfg, **inputs)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)
    # fusion composes with int8 quantization
    q = quantize_dit_params(fused, min_size=64 * 64)
    out_q = flux_dit_apply(q, cfg, **inputs)
    err = float(jnp.abs(out_q - ref).mean() / jnp.abs(ref).mean())
    assert err < 0.05


def test_fuse_single_block_io_matches(key):
    """in_proj fusion + out split == the unfused single blocks, with and
    without a condition stream, and composes with W8A8 quantization."""
    from reflectionflow_tpu.ops.fuse import fuse_dit_qkv, fuse_single_block_io

    cfg = FluxDiTConfig.tiny()
    params = flux_dit_init(key, cfg)
    fused = fuse_single_block_io(fuse_dit_qkv(params))
    sb = fused["single_blocks"]
    assert "in_proj" in sb and "out_attn" in sb and "out_mlp" in sb
    assert "mlp_in" not in sb and "out" not in sb and "qkv" not in sb["attn"]
    inputs = dict(
        img=jax.random.normal(jax.random.PRNGKey(1), (1, 16, cfg.in_channels)),
        txt=jax.random.normal(jax.random.PRNGKey(2), (1, 8, cfg.text_dim)),
        pooled=jax.random.normal(jax.random.PRNGKey(3), (1, cfg.pooled_dim)),
        timestep=jnp.array([0.5]),
        img_ids=jnp.asarray(make_image_ids(4, 4)),
        txt_ids=jnp.asarray(make_text_ids(8)),
        guidance=jnp.array([3.5]),
    )
    cond_inputs = dict(
        inputs,
        cond=jax.random.normal(jax.random.PRNGKey(4), (1, 4, cfg.in_channels)),
        cond_ids=jnp.asarray(make_image_ids(2, 2)),
        c_factor=2.0,
    )
    for inp in (inputs, cond_inputs):
        ref = flux_dit_apply(params, cfg, **inp)
        out = flux_dit_apply(fused, cfg, **inp)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-4)
    # idempotent / layout-guarded: re-fusing or fusing a quantized tree is a no-op
    assert fuse_single_block_io(fused) is fused or "in_proj" in fuse_single_block_io(fused)["single_blocks"]
    q = quantize_dit_params(fused, min_size=64 * 64, act_quant=True)
    assert "act_q" in q["single_blocks"]["in_proj"]
    assert fuse_single_block_io(q)["single_blocks"].keys() == q["single_blocks"].keys()
    out_q = flux_dit_apply(q, cfg, **inputs)
    ref = flux_dit_apply(params, cfg, **inputs)
    err = float(jnp.abs(out_q - ref).mean() / jnp.abs(ref).mean())
    assert err < 0.05, err


def test_rope_split_layout_matches(key):
    """Half-split RoPE layout (permuted q/k weights + tables, contiguous-half
    rotation) == the pair layout, through the full DiT with and without the
    cond stream, composed with the serving fusions and quantization."""
    from reflectionflow_tpu.models.flux.rope import (
        apply_rope,
        apply_rope_split,
        rope_split_perm,
        rope_tables,
    )
    from reflectionflow_tpu.ops.fuse import fuse_dit_qkv, fuse_single_block_io, permute_rope_layout

    # op-level: rotating permuted lanes with permuted tables == permuting the
    # pair-layout rotation
    D = 8
    x = jax.random.normal(key, (1, 6, 2, D))
    ids = jnp.asarray(np.arange(6, dtype=np.float32)[:, None] * np.ones((1, 3), np.float32))
    cos, sin = rope_tables(ids, (2, 2, 4))
    perm = rope_split_perm(D)
    ref = apply_rope(x, cos, sin)[..., perm]
    out = apply_rope_split(x[..., perm], cos[:, perm], sin[:, perm])
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-6)

    # model-level
    cfg = FluxDiTConfig.tiny()
    params = flux_dit_init(key, cfg)
    serving = permute_rope_layout(fuse_single_block_io(fuse_dit_qkv(params)), cfg.head_dim)
    inputs = dict(
        img=jax.random.normal(jax.random.PRNGKey(1), (1, 16, cfg.in_channels)),
        txt=jax.random.normal(jax.random.PRNGKey(2), (1, 8, cfg.text_dim)),
        pooled=jax.random.normal(jax.random.PRNGKey(3), (1, cfg.pooled_dim)),
        timestep=jnp.array([0.5]),
        img_ids=jnp.asarray(make_image_ids(4, 4)),
        txt_ids=jnp.asarray(make_text_ids(8)),
        guidance=jnp.array([3.5]),
    )
    cond_inputs = dict(
        inputs,
        cond=jax.random.normal(jax.random.PRNGKey(4), (1, 4, cfg.in_channels)),
        cond_ids=jnp.asarray(make_image_ids(2, 2)),
        c_factor=2.0,
    )
    for inp in (inputs, cond_inputs):
        ref = flux_dit_apply(params, cfg, **inp)
        out = flux_dit_apply(serving, cfg, **inp, rope_layout="split")
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-4)
    # quantization on top stays close
    q = quantize_dit_params(serving, min_size=64 * 64, act_quant=True)
    out_q = flux_dit_apply(q, cfg, **inputs, rope_layout="split")
    ref = flux_dit_apply(params, cfg, **inputs)
    err = float(jnp.abs(out_q - ref).mean() / jnp.abs(ref).mean())
    assert err < 0.05, err


def test_rope_split_fast_path_bf16_cosine(key):
    """The serving fast path (bf16 rope tables + storage-dtype QK-norm,
    selected by rope_layout='split' on bf16 activations) stays directionally
    faithful to the exact fp32-elementwise pair-layout forward."""
    from reflectionflow_tpu.ops.fuse import fuse_dit_qkv, fuse_single_block_io, permute_rope_layout

    cfg = FluxDiTConfig.tiny()
    params = flux_dit_init(key, cfg, jnp.bfloat16)
    serving = permute_rope_layout(fuse_single_block_io(fuse_dit_qkv(params)), cfg.head_dim)
    inputs = dict(
        img=jax.random.normal(jax.random.PRNGKey(1), (1, 16, cfg.in_channels), jnp.bfloat16),
        txt=jax.random.normal(jax.random.PRNGKey(2), (1, 8, cfg.text_dim), jnp.bfloat16),
        pooled=jax.random.normal(jax.random.PRNGKey(3), (1, cfg.pooled_dim), jnp.bfloat16),
        timestep=jnp.array([0.5], jnp.bfloat16),
        img_ids=jnp.asarray(make_image_ids(4, 4)),
        txt_ids=jnp.asarray(make_text_ids(8)),
        guidance=jnp.array([3.5], jnp.bfloat16),
    )
    ref = np.asarray(flux_dit_apply(params, cfg, **inputs), np.float32).ravel()
    out = np.asarray(flux_dit_apply(serving, cfg, **inputs, rope_layout="split"), np.float32).ravel()
    cos = float(ref @ out / (np.linalg.norm(ref) * np.linalg.norm(out)))
    assert cos > 0.999, cos


def test_quantized_t5_and_qwen_lm_run(key):
    """int8 path through T5 and the Qwen LM (review fix: raw matmuls)."""
    from reflectionflow_tpu.config import QwenLMConfig, T5Config
    from reflectionflow_tpu.models.flux.text import t5_encode, t5_encoder_init
    from reflectionflow_tpu.models.qwen_vl.lm import qwen_lm_apply, qwen_lm_init

    t5_cfg = T5Config.tiny()
    t5 = t5_encoder_init(key, t5_cfg)
    t5_q = quantize_dit_params(t5, min_size=16)
    assert "w_q" in t5_q["blocks"]["q"]
    ids = jnp.asarray(np.array([[3, 5, 7, 1]], np.int32))
    ref = t5_encode(t5, t5_cfg, ids)
    out = t5_encode(t5_q, t5_cfg, ids)
    rel = float(jnp.abs(out - ref).mean() / jnp.abs(ref).mean())
    assert rel < 0.1, rel

    lm_cfg = QwenLMConfig.tiny()
    lm = qwen_lm_init(jax.random.PRNGKey(1), lm_cfg)
    lm_q = dict(lm, blocks=quantize_dit_params({"blocks": lm["blocks"]}, min_size=16)["blocks"])
    pos = jnp.asarray(np.broadcast_to(np.arange(4)[None, None, :], (3, 1, 4)))
    emb = jnp.asarray(np.asarray(lm["embed"])[np.array([[3, 5, 7, 9]])])
    ref, _ = qwen_lm_apply(lm, lm_cfg, emb, pos)
    out, _ = qwen_lm_apply(lm_q, lm_cfg, emb, pos)
    assert np.isfinite(np.asarray(out)).all()


def test_int8_matmul_w8a8_accuracy(key):
    """Native int8 x int8 -> int32 matmul with per-token activation quant."""
    from reflectionflow_tpu.ops.quant import int8_matmul

    k1, k2 = jax.random.split(key)
    x = jax.random.normal(k1, (4, 32, 256))
    p = {"w": jax.random.normal(k2, (256, 128)) * (256**-0.5)}
    q = quantize_linear(p, act_quant=True)
    assert "act_q" in q
    ref = x @ p["w"]
    out = int8_matmul(x, q["w_q"], q["w_scale"])
    # two int8 roundings: ~1-2% relative error
    rel = float(jnp.abs(out - ref).mean() / jnp.abs(ref).mean())
    assert rel < 0.03, rel
    # and the linear() dispatch picks the same path
    np.testing.assert_allclose(np.asarray(linear(q, x)), np.asarray(out), atol=1e-6)


def test_dit_w8a8_cosine_similarity(key):
    """Full DiT forward under W8A8 stays directionally faithful to fp32
    (the numerics check for the int8 MXU serving path)."""
    cfg = FluxDiTConfig.tiny()
    params = flux_dit_init(key, cfg)
    q_w8a8 = quantize_dit_params(params, min_size=64 * 64, act_quant=True)
    inputs = dict(
        img=jax.random.normal(jax.random.PRNGKey(1), (1, 16, cfg.in_channels)),
        txt=jax.random.normal(jax.random.PRNGKey(2), (1, 8, cfg.text_dim)),
        pooled=jax.random.normal(jax.random.PRNGKey(3), (1, cfg.pooled_dim)),
        timestep=jnp.array([0.5]),
        img_ids=jnp.asarray(make_image_ids(4, 4)),
        txt_ids=jnp.asarray(make_text_ids(8)),
        guidance=jnp.array([3.5]),
    )
    ref = np.asarray(flux_dit_apply(params, cfg, **inputs)).ravel()
    out = np.asarray(flux_dit_apply(q_w8a8, cfg, **inputs)).ravel()
    cos = float(np.dot(ref, out) / (np.linalg.norm(ref) * np.linalg.norm(out)))
    assert cos > 0.995, cos


def test_int4_matmul_accuracy(key):
    """Packed int4 w4a16 group-quantized matmul."""
    from reflectionflow_tpu.ops.quant import int4_matmul, quantize_linear_int4

    k1, k2 = jax.random.split(key)
    x = jax.random.normal(k1, (2, 8, 256))
    p = {"w": jax.random.normal(k2, (256, 96)) * (256**-0.5), "b": jnp.zeros((96,))}
    q = quantize_linear_int4(p, group=64)
    assert q["w_p4"].dtype == jnp.uint8
    assert q["w_p4"].shape == (4, 32, 96)  # G=4, group/2=32
    ref = x @ p["w"]
    out = int4_matmul(x, q["w_p4"], q["w_scale4"])
    rel = float(jnp.abs(out - ref).mean() / jnp.abs(ref).mean())
    # NF4 on gaussian weights: ~9% relative output error is the physics
    # (uniform int4 would be ~11%)
    assert rel < 0.105, rel
    np.testing.assert_allclose(np.asarray(linear(q, x)), np.asarray(out), atol=1e-6)
    # non-groupable shapes fall back to int8
    q_fb = quantize_linear_int4({"w": p["w"][:100]}, group=64)
    assert "w_q" in q_fb and "w_p4" not in q_fb


def test_int4_t5_encode_close(key):
    """int4 T5 (the 16 GB co-residency configuration) stays close to fp32."""
    from reflectionflow_tpu.config import T5Config
    from reflectionflow_tpu.models.flux.text import t5_encode, t5_encoder_init
    from reflectionflow_tpu.ops.quant import quantize_params_int4

    t5_cfg = T5Config.tiny()
    t5 = t5_encoder_init(key, t5_cfg)
    t5_q = quantize_params_int4(t5, min_size=16, group=16)
    ids = jnp.asarray(np.array([[3, 5, 7, 1]], np.int32))
    ref = np.asarray(t5_encode(t5, t5_cfg, ids)).ravel()
    out = np.asarray(t5_encode(t5_q, t5_cfg, ids)).ravel()
    cos = float(np.dot(ref, out) / (np.linalg.norm(ref) * np.linalg.norm(out)))
    # tiny config (d_model 32, group=16, NO residual damping at depth 2) is
    # the worst case; real T5 uses group=128 on 4096-wide contractions where
    # NF4 noise averages out across far more terms
    assert cos > 0.95, cos


def test_int8_weight_only_t5_encode_close(key):
    """w8a16 int8 T5 (the phase-swap fast-encode profile,
    pipeline_args.t5_quant="int8") stays close to fp32."""
    from reflectionflow_tpu.config import T5Config
    from reflectionflow_tpu.models.flux.text import t5_encode, t5_encoder_init
    from reflectionflow_tpu.ops.quant import quantize_dit_params

    t5_cfg = T5Config.tiny()
    t5 = t5_encoder_init(key, t5_cfg)
    t5_q = quantize_dit_params(t5, min_size=16, act_quant=False)
    # weight-only: no act_q markers anywhere in the tree
    import jax

    assert not any(
        path.endswith("act_q") for path, _ in
        [(jax.tree_util.keystr(kp), v) for kp, v in jax.tree_util.tree_leaves_with_path(t5_q)]
    )
    ids = jnp.asarray(np.array([[3, 5, 7, 1]], np.int32))
    ref = np.asarray(t5_encode(t5, t5_cfg, ids)).ravel()
    out = np.asarray(t5_encode(t5_q, t5_cfg, ids)).ravel()
    cos = float(np.dot(ref, out) / (np.linalg.norm(ref) * np.linalg.norm(out)))
    assert cos > 0.99, cos  # int8 per-channel beats NF4's 0.95 floor here


def test_pipeline_quantize_weight_only_t5(key):
    """pipe.quantize(weight_only=("t5",)) quantizes T5 int8 w8a16 and the
    pipeline still encodes/generates."""
    import jax

    from reflectionflow_tpu.config import CLIPTextConfig, FluxVAEConfig, T5Config
    from reflectionflow_tpu.sampler.pipeline import FluxPipeline

    pipe = FluxPipeline.random_init(
        jax.random.PRNGKey(0),
        dit_cfg=FluxDiTConfig.tiny(),
        vae_cfg=FluxVAEConfig.tiny(),
        t5_cfg=T5Config.tiny(),
        clip_cfg=CLIPTextConfig.tiny(),
        dtype=jnp.float32,
    )
    pipe.quantize(which=("dit",), int4=(), weight_only=("t5",))
    out = pipe.generate(["x"], height=16, width=16, num_inference_steps=2, seed=1)
    assert out.shape == (1, 16, 16, 3)


def test_pipeline_quantize_generate(key):
    """pipe.quantize() (fuse + int8) end-to-end through generate()."""
    import jax

    from reflectionflow_tpu.config import CLIPTextConfig, FluxVAEConfig, T5Config
    from reflectionflow_tpu.sampler.pipeline import FluxPipeline

    pipe = FluxPipeline.random_init(
        jax.random.PRNGKey(0),
        dit_cfg=FluxDiTConfig.tiny(),
        vae_cfg=FluxVAEConfig.tiny(),
        t5_cfg=T5Config.tiny(),
        clip_cfg=CLIPTextConfig.tiny(),
        dtype=jnp.float32,
    )
    base = pipe.generate(["x"], height=16, width=16, num_inference_steps=2, seed=1)
    pipe.quantize(which=("dit",))  # tiny T5/dit mats under min_size stay fp
    assert "qkv" in pipe.params["dit"]["double_blocks"]["attn"]
    out = pipe.generate(["x"], height=16, width=16, num_inference_steps=2, seed=1)
    assert out.shape == base.shape
    # nothing quantized at tiny sizes -> fused-only result matches baseline
    np.testing.assert_allclose(base.astype(np.int32), out.astype(np.int32), atol=2)


def test_act_quant_exclude_paths(key):
    cfg = FluxDiTConfig.tiny()
    params = flux_dit_init(key, cfg)
    q = quantize_dit_params(params, min_size=64 * 64, act_quant_exclude=("_mod", "mod/"))
    # modulation projections stay weight-only (no act_q marker)
    assert "w_q" in q["double_blocks"]["img_mod"] and "act_q" not in q["double_blocks"]["img_mod"]
    assert "act_q" in q["double_blocks"]["attn"]["q"]


def test_dit_int4_mlp_co_residency_profile(key):
    """Mixed tree: MLP weights NF4, attention W8A8 — the no-phase-swap
    16 GB profile (pipeline_args.dit_quant="int8_int4mlp"). The forward
    dispatches per leaf and stays close to the unquantized model."""
    from reflectionflow_tpu.models.flux.dit import flux_dit_apply, flux_dit_init
    from reflectionflow_tpu.models.flux.rope import make_image_ids, make_text_ids
    from reflectionflow_tpu.ops.fuse import fuse_dit_qkv, fuse_single_block_io
    from reflectionflow_tpu.ops.quant import quantize_dit_params

    cfg = FluxDiTConfig.tiny()
    params = flux_dit_init(key, cfg)
    serving = fuse_single_block_io(fuse_dit_qkv(params))
    q = quantize_dit_params(
        serving, min_size=64 * 64, act_quant=True,
        int4_paths=("img_mlp", "txt_mlp", "out_mlp"), int4_group=16,
    )
    assert "w_p4" in q["double_blocks"]["img_mlp"]["fc1"]
    assert "w_p4" in q["single_blocks"]["out_mlp"]
    assert "act_q" in q["single_blocks"]["in_proj"]  # attention stays W8A8
    inputs = dict(
        img=jax.random.normal(jax.random.PRNGKey(1), (1, 16, cfg.in_channels)),
        txt=jax.random.normal(jax.random.PRNGKey(2), (1, 8, cfg.text_dim)),
        pooled=jax.random.normal(jax.random.PRNGKey(3), (1, cfg.pooled_dim)),
        timestep=jnp.array([0.5]),
        img_ids=jnp.asarray(make_image_ids(4, 4)),
        txt_ids=jnp.asarray(make_text_ids(8)),
        guidance=jnp.array([3.5]),
    )
    exact = np.asarray(flux_dit_apply(params, cfg, **inputs)).ravel()
    out = np.asarray(flux_dit_apply(q, cfg, **inputs)).ravel()
    cos = float(exact @ out / (np.linalg.norm(exact) * np.linalg.norm(out)))
    assert cos > 0.99, cos


def test_pipeline_quantize_int4_mlp(key):
    """pipe.quantize(dit_int4_mlp=True) end-to-end through generate()."""
    import jax

    from reflectionflow_tpu.config import CLIPTextConfig, FluxVAEConfig, T5Config
    from reflectionflow_tpu.sampler.pipeline import FluxPipeline

    pipe = FluxPipeline.random_init(
        jax.random.PRNGKey(0),
        dit_cfg=FluxDiTConfig.tiny(),
        vae_cfg=FluxVAEConfig.tiny(),
        t5_cfg=T5Config.tiny(),
        clip_cfg=CLIPTextConfig.tiny(),
        dtype=jnp.float32,
    )
    pipe.quantize(which=("dit",), dit_int4_mlp=True, min_size=16 * 16, int4_group=16)
    dit = pipe.params["dit"]
    # MLP leaves actually went NF4, attention panels actually went int8
    assert "w_p4p" in dit["double_blocks"]["img_mlp"]["fc1"]  # serving default: plane layout
    assert "w_p4p" in dit["single_blocks"]["out_mlp"]
    assert "w_q" in dit["single_blocks"]["in_proj"]
    out = pipe.generate(["x"], height=16, width=16, num_inference_steps=2, seed=1)
    assert out.shape == (1, 16, 16, 3)


def test_dit_int4_mlp_pallas_serving_path(key):
    """The mixed NF4-MLP/W8A8 tree through the full Pallas serving path
    (split rope + fused act-quant kernels + flash attention, interpret):
    int4 leaves must fall off the fused-quant gates onto w4a16 cleanly."""
    from reflectionflow_tpu.models.flux.dit import flux_dit_apply, flux_dit_init
    from reflectionflow_tpu.models.flux.rope import make_image_ids, make_text_ids
    from reflectionflow_tpu.ops.fuse import fuse_dit_qkv, fuse_single_block_io, permute_rope_layout
    from reflectionflow_tpu.ops.quant import quantize_dit_params

    cfg = FluxDiTConfig.tiny()
    params = flux_dit_init(key, cfg)
    serving = permute_rope_layout(fuse_single_block_io(fuse_dit_qkv(params)), cfg.head_dim)
    q = quantize_dit_params(
        serving, min_size=64 * 64, act_quant=True,
        int4_paths=("img_mlp", "txt_mlp", "out_mlp"), int4_group=16,
    )
    inputs = dict(
        img=jax.random.normal(jax.random.PRNGKey(1), (1, 16, cfg.in_channels)),
        txt=jax.random.normal(jax.random.PRNGKey(2), (1, 8, cfg.text_dim)),
        pooled=jax.random.normal(jax.random.PRNGKey(3), (1, cfg.pooled_dim)),
        timestep=jnp.array([0.5]),
        img_ids=jnp.asarray(make_image_ids(4, 4)),
        txt_ids=jnp.asarray(make_text_ids(8)),
        guidance=jnp.array([3.5]),
    )
    ref = np.asarray(flux_dit_apply(q, cfg, **inputs, rope_layout="split")).ravel()
    out = np.asarray(
        flux_dit_apply(q, cfg, **inputs, rope_layout="split", attn_impl="pallas_interpret")
    ).ravel()
    cos = float(ref @ out / (np.linalg.norm(ref) * np.linalg.norm(out)))
    assert cos > 0.999, cos


def test_fuse_tolerates_missing_biases(key):
    """fuse ops handle bias-less linears: missing biases contribute zeros
    when any sibling has one; an all-bias-less fusion carries no 'b'."""
    from reflectionflow_tpu.ops.fuse import _fuse_parts

    w1 = {"w": jax.random.normal(key, (8, 4)), "b": jnp.ones((4,))}
    w2 = {"w": jax.random.normal(jax.random.PRNGKey(1), (8, 6))}  # no bias
    fused = _fuse_parts([w1, w2])
    assert fused["w"].shape == (8, 10)
    np.testing.assert_allclose(np.asarray(fused["b"]), [1, 1, 1, 1, 0, 0, 0, 0, 0, 0])
    none = _fuse_parts([{"w": w2["w"]}, {"w": w2["w"]}])
    assert "b" not in none


def test_int4_plane_layout_matches_pair():
    """Split-plane NF4 packing (quantize_linear_int4_plane / w_p4p) is
    numerically identical to the pair layout — same codes, same scales,
    different nibble placement (dequant avoids the even/odd relayout)."""
    import numpy as np

    from reflectionflow_tpu.ops.quant import (
        int4_matmul,
        int4_matmul_plane,
        quantize_linear_int4,
        quantize_linear_int4_plane,
        quantize_params_int4,
    )

    rng = np.random.default_rng(3)
    w = jnp.asarray(rng.standard_normal((256, 48)) * 0.04, jnp.float32)
    b = jnp.asarray(rng.standard_normal((48,)), jnp.float32)
    x = jnp.asarray(rng.standard_normal((5, 256)), jnp.float32)
    q4 = quantize_linear_int4({"w": w, "b": b}, group=128)
    q4p = quantize_linear_int4_plane({"w": w, "b": b}, group=128)
    np.testing.assert_array_equal(np.asarray(q4["w_scale4"]), np.asarray(q4p["w_scale4"]))
    np.testing.assert_allclose(
        np.asarray(int4_matmul(x, q4["w_p4"], q4["w_scale4"])),
        np.asarray(int4_matmul_plane(x, q4p["w_p4p"], q4p["w_scale4"])),
        atol=1e-6,
    )
    # tree entry point + model dispatch
    from reflectionflow_tpu.models.flux.dit import linear

    tree = quantize_params_int4({"fc": {"w": w, "b": b}}, min_size=1, layout="plane")
    assert "w_p4p" in tree["fc"]
    out = linear(tree["fc"], x)
    ref = linear(quantize_params_int4({"fc": {"w": w, "b": b}}, min_size=1)["fc"], x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-6)
    # small/ungroupable shapes fall back identically
    small = quantize_linear_int4_plane({"w": w[:96]}, group=128)
    assert "w_q" in small  # int8 weight-only fallback
