import jax
import jax.numpy as jnp
import numpy as np

from reflectionflow_tpu.config import FluxDiTConfig
from reflectionflow_tpu.lora import (
    corrector_target_paths,
    fold_lora,
    lora_init,
    lora_param_count,
    make_dit_param_views,
)
from reflectionflow_tpu.lora.lora import convert_diffusers_lora
from reflectionflow_tpu.models.flux.dit import flux_dit_apply, flux_dit_init
from reflectionflow_tpu.models.flux.rope import make_image_ids, make_text_ids

CFG = FluxDiTConfig.tiny()


def _inputs(B=1, Lt=4, Li=16):
    return dict(
        img=jax.random.normal(jax.random.PRNGKey(1), (B, Li, CFG.in_channels)),
        txt=jax.random.normal(jax.random.PRNGKey(2), (B, Lt, CFG.text_dim)),
        pooled=jax.random.normal(jax.random.PRNGKey(3), (B, CFG.pooled_dim)),
        timestep=jnp.array([0.5] * B),
        img_ids=jnp.asarray(make_image_ids(4, 4)),
        txt_ids=jnp.asarray(make_text_ids(Lt)),
        guidance=jnp.array([3.5] * B),
    )


def test_init_covers_targets_and_zero_effect(key):
    params = flux_dit_init(jax.random.PRNGKey(0), CFG)
    lora = lora_init(key, params, r=4, alpha=4)
    assert len(lora["adapters"]) == len(corrector_target_paths())
    assert lora_param_count(lora) > 0
    # B = 0 -> fold is identity
    folded = fold_lora(params, lora)
    for (p1, a), (p2, b) in zip(
        jax.tree_util.tree_flatten_with_path(params)[0][:5],
        jax.tree_util.tree_flatten_with_path(folded)[0][:5],
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-7)


def _nonzero_lora(params, key):
    lora = lora_init(key, params, r=4, alpha=4)
    lora["adapters"] = jax.tree.map(
        lambda x: x + 0.05 * jax.random.normal(key, x.shape), lora["adapters"]
    )
    return lora


def test_fold_changes_only_targets(key):
    params = flux_dit_init(jax.random.PRNGKey(0), CFG)
    lora = _nonzero_lora(params, key)
    folded = fold_lora(params, lora)
    # txt-side weights untouched
    np.testing.assert_array_equal(
        np.asarray(params["double_blocks"]["attn"]["txt_q"]["w"]),
        np.asarray(folded["double_blocks"]["attn"]["txt_q"]["w"]),
    )
    np.testing.assert_array_equal(
        np.asarray(params["txt_in"]["w"]), np.asarray(folded["txt_in"]["w"])
    )
    # img-side adapted
    assert not np.array_equal(
        np.asarray(params["double_blocks"]["attn"]["q"]["w"]),
        np.asarray(folded["double_blocks"]["attn"]["q"]["w"]),
    )
    assert not np.array_equal(np.asarray(params["img_in"]["w"]), np.asarray(folded["img_in"]["w"]))


def test_latent_lora_false_img_stream_unaffected(key):
    """With latent_lora=False the adapter must act ONLY through the condition
    stream: a no-cond forward is identical to base."""
    params = flux_dit_init(jax.random.PRNGKey(0), CFG)
    lora = _nonzero_lora(params, key)
    main, cond_view = make_dit_param_views(params, lora, latent_lora=False)
    inputs = _inputs()
    base = flux_dit_apply(params, CFG, **inputs)
    adapted = flux_dit_apply(main, CFG, **inputs, cond_params=cond_view)
    np.testing.assert_allclose(np.asarray(base), np.asarray(adapted), atol=1e-6)

    # but WITH a condition the adapter changes the output
    cond = jax.random.normal(jax.random.PRNGKey(7), (1, 4, CFG.in_channels))
    cond_ids = jnp.asarray(make_image_ids(2, 2, position_delta=(0, -2)))
    out_base = flux_dit_apply(params, CFG, **inputs, cond=cond, cond_ids=cond_ids)
    out_adapted = flux_dit_apply(
        main, CFG, **inputs, cond=cond, cond_ids=cond_ids, cond_params=cond_view
    )
    assert not np.allclose(np.asarray(out_base), np.asarray(out_adapted), atol=1e-5)


def test_latent_lora_true_affects_everything(key):
    params = flux_dit_init(jax.random.PRNGKey(0), CFG)
    lora = _nonzero_lora(params, key)
    main, cond_view = make_dit_param_views(params, lora, latent_lora=True)
    inputs = _inputs()
    base = flux_dit_apply(params, CFG, **inputs)
    adapted = flux_dit_apply(main, CFG, **inputs, cond_params=cond_view)
    assert not np.allclose(np.asarray(base), np.asarray(adapted), atol=1e-5)


def test_lora_scale_linearity(key):
    params = flux_dit_init(jax.random.PRNGKey(0), CFG)
    lora = _nonzero_lora(params, key)
    f1 = fold_lora(params, lora, scale=1.0)
    f2 = fold_lora(params, lora, scale=2.0)
    d1 = np.asarray(f1["img_in"]["w"]) - np.asarray(params["img_in"]["w"])
    d2 = np.asarray(f2["img_in"]["w"]) - np.asarray(params["img_in"]["w"])
    np.testing.assert_allclose(d2, 2 * d1, rtol=1e-5, atol=1e-7)


def test_convert_diffusers_lora_roundtrip():
    """Synthesize a diffusers-style LoRA state dict and convert."""
    rng = np.random.default_rng(0)
    r, H = 4, CFG.hidden_size
    sd = {}
    for i in range(CFG.num_double_blocks):
        sd[f"transformer.transformer_blocks.{i}.attn.to_q.lora_A.weight"] = rng.normal(size=(r, H)).astype(np.float32)
        sd[f"transformer.transformer_blocks.{i}.attn.to_q.lora_B.weight"] = rng.normal(size=(H, r)).astype(np.float32)
    sd["transformer.x_embedder.lora_A.weight"] = rng.normal(size=(r, CFG.in_channels)).astype(np.float32)
    sd["transformer.x_embedder.lora_B.weight"] = rng.normal(size=(H, r)).astype(np.float32)
    lora = convert_diffusers_lora(sd, CFG.num_double_blocks, CFG.num_single_blocks, alpha=r)
    assert lora["_r"] == r
    A = lora["adapters"]["double_blocks/attn/q/w"]["A"]
    assert A.shape == (CFG.num_double_blocks, H, r)
    np.testing.assert_array_equal(
        A[1], sd["transformer.transformer_blocks.1.attn.to_q.lora_A.weight"].T
    )
    assert lora["adapters"]["img_in/w"]["A"].shape == (CFG.in_channels, r)


def test_attach_lora_matches_fold(key):
    """Per-layer low-rank adds (training path) == full fold, outputs AND
    adapter gradients."""
    import numpy as np

    from reflectionflow_tpu.config import FluxDiTConfig
    from reflectionflow_tpu.lora.lora import attach_lora, fold_lora, lora_init
    from reflectionflow_tpu.models.flux.dit import flux_dit_apply, flux_dit_init
    from reflectionflow_tpu.models.flux.rope import make_image_ids, make_text_ids

    cfg = FluxDiTConfig.tiny()
    params = flux_dit_init(key, cfg)
    lora = lora_init(jax.random.PRNGKey(1), params, r=4, alpha=8)
    # make B nonzero so the adapter actually does something
    lora["adapters"] = jax.tree.map(
        lambda x: x + 0.01 * jax.random.normal(jax.random.PRNGKey(2), x.shape), lora["adapters"]
    )
    inputs = dict(
        img=jax.random.normal(jax.random.PRNGKey(3), (1, 16, cfg.in_channels)),
        txt=jax.random.normal(jax.random.PRNGKey(4), (1, 8, cfg.text_dim)),
        pooled=jax.random.normal(jax.random.PRNGKey(5), (1, cfg.pooled_dim)),
        timestep=jnp.array([0.5]),
        img_ids=jnp.asarray(make_image_ids(4, 4)),
        txt_ids=jnp.asarray(make_text_ids(8)),
        guidance=jnp.array([3.5]),
    )

    def out_with(tree_fn, adapters):
        l2 = {"_alpha": lora["_alpha"], "_r": lora["_r"], "adapters": adapters}
        return flux_dit_apply(tree_fn(params, l2), cfg, **inputs)

    folded_out = out_with(fold_lora, lora["adapters"])
    attached_out = out_with(attach_lora, lora["adapters"])
    np.testing.assert_allclose(
        np.asarray(attached_out), np.asarray(folded_out), atol=1e-5, rtol=1e-5
    )

    def loss(tree_fn, adapters):
        return jnp.sum(out_with(tree_fn, adapters) ** 2)

    g_fold = jax.grad(lambda a: loss(fold_lora, a))(lora["adapters"])
    g_attach = jax.grad(lambda a: loss(attach_lora, a))(lora["adapters"])
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4, rtol=1e-4),
        g_attach,
        g_fold,
    )


def test_lora_adapter_file_roundtrip(tmp_path):
    """save_lora_adapter/load_lora_adapter preserve the tree and its fold
    (the one-file adapter interchange used for finetuned Reflection-Generator
    checkpoints, reference tts/configs/our_reflectionmodel.yaml)."""
    from reflectionflow_tpu.lora.lora import load_lora_adapter, save_lora_adapter

    key = jax.random.PRNGKey(7)
    params = {"blk": {"q": {"w": jax.random.normal(key, (3, 8, 8))}}}
    lora = lora_init(jax.random.PRNGKey(8), params, r=2, alpha=4.0, targets=("blk/q/w",))
    # gaussian-init B is zero; make the fold non-trivial
    lora["adapters"]["blk/q/w"]["B"] = jax.random.normal(jax.random.PRNGKey(9), (3, 2, 8))
    p = str(tmp_path / "lora.safetensors")
    save_lora_adapter(p, lora)
    back = load_lora_adapter(p)
    assert back["_alpha"] == 4.0 and back["_r"] == 2
    assert set(back["adapters"]) == {"blk/q/w"}
    np.testing.assert_allclose(
        np.asarray(fold_lora(params, lora)["blk"]["q"]["w"]),
        np.asarray(fold_lora(params, back)["blk"]["q"]["w"]),
        atol=1e-6,
    )


def test_generator_folds_adapter_at_load(tmp_path):
    """A `lora.safetensors` next to a Reflection-Generator checkpoint is
    folded into the LM at load; absence is a no-op."""
    from reflectionflow_tpu.lora.lora import save_lora_adapter
    from reflectionflow_tpu.models.qwen_vl.generate import _maybe_fold_adapter
    from reflectionflow_tpu.models.qwen_vl.model import QwenVLModel

    model = QwenVLModel.random_init(jax.random.PRNGKey(0), dtype=jnp.float32)
    base_q = np.asarray(model.lm_params["blocks"]["q"]["w"]).copy()
    # no adapter file -> untouched
    model = _maybe_fold_adapter(model, str(tmp_path))
    np.testing.assert_array_equal(np.asarray(model.lm_params["blocks"]["q"]["w"]), base_q)

    n, d, r = base_q.shape[0], base_q.shape[1], 2
    A = jax.random.normal(jax.random.PRNGKey(1), (n, d, r)) * 0.1
    B = jax.random.normal(jax.random.PRNGKey(2), (n, r, base_q.shape[2])) * 0.1
    save_lora_adapter(
        str(tmp_path / "lora.safetensors"),
        {"_alpha": 4.0, "_r": r, "adapters": {"blocks/q/w": {"A": A, "B": B}}},
    )
    model = _maybe_fold_adapter(model, str(tmp_path))
    want = base_q + (4.0 / r) * np.einsum("ndr,nrk->ndk", np.asarray(A, np.float32),
                                          np.asarray(B, np.float32))
    np.testing.assert_allclose(
        np.asarray(model.lm_params["blocks"]["q"]["w"]), want, atol=1e-4, rtol=1e-4
    )
