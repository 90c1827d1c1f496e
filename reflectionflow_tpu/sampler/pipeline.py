"""FluxPipeline: weights + tokenizers + the jitted sampling core.

The user-facing object with capability parity to the reference's
diffusers `FluxPipeline` usage plus the conditioned `generate()`
(`/root/reference/train_flux/flux/generate.py:75`): text encoding (T5
sequence + CLIP pooled), packed-latent preparation, dynamic-shift schedule,
conditioned Euler loop, VAE decode. Prompt suffixing for reflections
(`"{prompt} [Reflexion]: {reflection}"`) happens in the search layer.

All heavy compute is jitted with shapes fixed per (resolution, steps,
batch) triple, so round k>1 reuses the compiled executable.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..config import CLIPTextConfig, FluxDiTConfig, FluxVAEConfig, T5Config
from ..models.flux.dit import flux_dit_init
from ..models.flux.latents import draw_packed_noise, latent_tokens, unpack_latents
from ..models.flux.rope import make_image_ids, make_text_ids
from ..models.flux.text import clip_text_encode, clip_text_init, t5_encode, t5_encoder_init
from ..models.flux.vae import vae_decode, vae_init
from ..utils.tokenizers import load_tokenizer
from .condition import Condition, encode_conditions
from .generate import denoise, make_schedule, vcache_kwargs


@dataclass
class FluxPipeline:
    dit_cfg: FluxDiTConfig
    vae_cfg: FluxVAEConfig
    t5_cfg: T5Config
    clip_cfg: CLIPTextConfig
    params: dict  # {"dit":..., "vae":..., "t5":..., "clip":...}
    t5_tokenizer: Any
    clip_tokenizer: Any
    dtype: Any = jnp.bfloat16
    model_flags: dict = field(default_factory=dict)  # union_cond_attn / add_cond_attn
    attn_impl: str = "xla"
    cond_dit_params: Any = None  # LoRA-folded view for the cond stream (lora.make_dit_param_views)
    mesh: Any = None  # jax.sharding.Mesh: candidates sharded over "data"
    rope_layout: str = "pair"  # "split" after quantize() permutes q/k (ops.fuse)
    vae_tiling: bool = False  # diffusers enable_vae_tiling: 512px-tile encode+decode
    # opt-in velocity cache (PipelineArgs.vcache): {"interval": k} static
    # schedule or {"threshold": x} TeaCache-style dynamic skipping
    vcache: Any = None

    # -- construction -------------------------------------------------------

    @classmethod
    def random_init(
        cls,
        key: jax.Array,
        dit_cfg: FluxDiTConfig | None = None,
        vae_cfg: FluxVAEConfig | None = None,
        t5_cfg: T5Config | None = None,
        clip_cfg: CLIPTextConfig | None = None,
        dtype=jnp.bfloat16,
        tokenizer_path: str | None = None,
    ) -> "FluxPipeline":
        """Random weights at the given configs (tests / synthetic benchmarks)."""
        dit_cfg = dit_cfg or FluxDiTConfig()
        vae_cfg = vae_cfg or FluxVAEConfig()
        t5_cfg = t5_cfg or T5Config()
        clip_cfg = clip_cfg or CLIPTextConfig()
        k1, k2, k3, k4 = jax.random.split(key, 4)
        params = {
            "dit": flux_dit_init(k1, dit_cfg, dtype),
            "vae": vae_init(k2, vae_cfg, dtype),
            "t5": t5_encoder_init(k3, t5_cfg, dtype),
            "clip": clip_text_init(k4, clip_cfg, dtype),
        }
        return cls(
            dit_cfg=dit_cfg,
            vae_cfg=vae_cfg,
            t5_cfg=t5_cfg,
            clip_cfg=clip_cfg,
            params=params,
            t5_tokenizer=load_tokenizer(tokenizer_path, "t5", t5_cfg.vocab_size, 1),
            clip_tokenizer=load_tokenizer(tokenizer_path, "clip", clip_cfg.vocab_size, clip_cfg.eos_token_id),
            dtype=dtype,
        )

    @classmethod
    def from_pretrained(cls, model_dir: str, dtype=jnp.bfloat16, **kw) -> "FluxPipeline":
        """Load a local HF FLUX snapshot (safetensors) — see utils.hf_loader."""
        from ..utils.hf_loader import load_flux_pipeline

        return load_flux_pipeline(cls, model_dir, dtype=dtype, **kw)

    def to_device(self, exclude: tuple[str, ...] = ()) -> "FluxPipeline":
        """Materialize weight trees on the accelerator once (loaders return
        host numpy arrays; without this every jit call re-transfers).

        `exclude` names trees kept host-side — the TPU analogue of the
        reference's `use_low_gpu_vram` ping-ponging
        (`/root/reference/tts/tts_reflectionflow.py:305,324-325`): e.g.
        `exclude=("t5",)` keeps T5-XXL off the 16 GB chip; its encode then
        streams weights per call (slow but memory-safe)."""
        for name in list(self.params):
            if name in exclude or self.params[name] is None:  # offloaded by phase swap
                continue
            self.params[name] = jax.device_put(self.params[name])
        if self.cond_dit_params is not None and "dit" not in exclude:
            self.cond_dit_params = jax.device_put(self.cond_dit_params)
        return self

    def quantize(
        self,
        which: tuple[str, ...] = ("dit",),
        fuse_qkv: bool = True,
        int4: tuple[str, ...] = ("t5",),
        act_quant_exclude: tuple[str, ...] = (),
        weight_only: tuple[str, ...] = (),
        dit_int4_mlp: bool = False,
        min_size: int = 1 << 20,
        int4_group: int = 128,
    ) -> "FluxPipeline":
        """Quantize the big weight trees in place (`ops.quant`) — the
        single-chip 16 GB serving configuration. `which` trees go int8
        (W8A8 on the MXU); `weight_only` trees go int8 with bf16 activations
        (w8a16 — matmuls at the bf16 MXU rate, no NF4 select-tree dequant:
        the right T5 profile under phase swap, where the 4.8 GB int8 tree
        never co-resides with the DiT); `int4` trees go packed int4 w4a16 —
        T5-XXL at 2.4 GB packed co-resides with the 11.9 GB int8 DiT, which
        is what makes a swap-free encode->denoise->decode pass possible on
        one v5e (the reference assumes 80 GB cards,
        /root/reference/tts/tts_reflectionflow.py:503-512). QKV projections
        are fused first (`ops.fuse`) so the int8 panels are as wide as
        possible."""
        from ..ops.fuse import fuse_dit_qkv, fuse_single_block_io, permute_rope_layout
        from ..ops.quant import quantize_dit_params, quantize_params_int4

        # fused panels are incompatible with the per-head TP partition specs
        # (parallel.specs shards q/k/v by heads); keep unfused under model-TP
        tp = self.mesh is not None and self.mesh.shape.get("model", 1) > 1
        if fuse_qkv and not tp and self.rope_layout != "split":
            # rope_layout == "split" means serving_layout already ran (a second
            # quantize() call); permute_rope_layout raises on quantized trees,
            # so the flag can only be "split" when the permutation succeeded.
            D = self.dit_cfg.head_dim

            def serving_layout(tree):
                return permute_rope_layout(fuse_single_block_io(fuse_dit_qkv(tree)), D)

            self.params["dit"] = serving_layout(self.params["dit"])
            if self.cond_dit_params is not None:
                self.cond_dit_params = serving_layout(self.cond_dit_params)
            self.rope_layout = "split"
        # co-residency profile: MLP weights (~60% of the DiT) packed NF4,
        # attention/mod panels int8 W8A8 — the whole pipeline then fits one
        # 16 GB chip WITHOUT phase swap (slower: NF4 matmuls run w4a16).
        # Covers BOTH layouts: the fused serving names (out_mlp) and the
        # unfused ones kept under model-TP (mlp_in, single_blocks/out/ —
        # the trailing slash keeps out_attn/txt_out int8)
        int4_paths = (
            ("img_mlp", "txt_mlp", "out_mlp", "mlp_in", "single_blocks/out/")
            if dit_int4_mlp else ()
        )
        for name in which:
            if name in self.params:
                self.params[name] = quantize_dit_params(
                    self.params[name], min_size=min_size,
                    act_quant_exclude=act_quant_exclude,
                    int4_paths=int4_paths if name == "dit" else (),
                    int4_group=int4_group, int4_layout="plane",
                )
        for name in weight_only:
            if name in self.params and name not in which:
                self.params[name] = quantize_dit_params(
                    self.params[name], min_size=min_size, act_quant=False
                )
        for name in int4:
            if name in self.params and name not in which and name not in weight_only:
                self.params[name] = quantize_params_int4(
                    self.params[name], min_size=min_size, layout="plane"
                )
        if self.cond_dit_params is not None and "dit" in which:
            self.cond_dit_params = quantize_dit_params(
                self.cond_dit_params, min_size=min_size,
                act_quant_exclude=act_quant_exclude,
                int4_paths=int4_paths, int4_group=int4_group, int4_layout="plane",
            )
        return self

    # -- phase swap (single-chip memory orchestration) -----------------------

    def enable_phase_swap(self, offload: tuple[str, ...] = ("t5",)) -> "FluxPipeline":
        """Keep host copies of the `offload` trees and free their device
        buffers between encode phases; prompt embeddings are cached, so
        fixed-prompt search (noise scaling, NFE curves) uploads the text
        encoder at most once. Library form of the phase swap the reference
        approximates with `use_low_gpu_vram` cpu<->cuda ping-ponging
        (/root/reference/tts/tts_reflectionflow.py:305,324-325)."""
        self._swap = tuple(n for n in offload if n in self.params)
        self._host_params = {n: jax.tree.map(np.asarray, self.params[n]) for n in self._swap}
        self._embed_cache: dict = {}
        self._embed_cache_cap = 2048  # ~8 GB host RAM worst case at 512x4096
        self._hold_encoders = False
        for n in self._swap:  # free device copies until first encode
            self.params[n] = None
        return self

    def _ensure_on_device(self, name: str) -> None:
        if self.params.get(name) is None and name in getattr(self, "_host_params", {}):
            self.params[name] = jax.device_put(self._host_params[name])

    def _offload(self, name: str) -> None:
        if name in getattr(self, "_host_params", {}):
            self.params[name] = None

    def enable_prompt_cache(self) -> "FluxPipeline":
        """Cache prompt embeddings per (prompt, L) WITHOUT offloading any
        tree — for co-resident profiles (dit_quant="int8_int4mlp") where
        the text encoders stay on device but fixed-prompt loops should
        still encode each prompt once. `enable_phase_swap` supersedes this
        (it creates the same cache plus host offload)."""
        if getattr(self, "_embed_cache", None) is None:
            self._embed_cache = {}
            self._embed_cache_cap = 2048
            self._hold_encoders = False
            self._swap = getattr(self, "_swap", ())
        return self

    # -- text ---------------------------------------------------------------

    def encode_prompts(self, prompts: Sequence[str], max_sequence_length: int = 512,
                       prompts_2: Sequence[str] | None = None):
        """-> (txt (B, L, text_dim), pooled (B, pooled_dim)), on device.

        T5 for the sequence stream, CLIP for the pooled AdaLN vector —
        semantics of `pipeline_tools.prepare_text_input`
        (/root/reference/train_flux/flux/pipeline_tools.py:33-52).
        `prompts_2` splits the towers the way diffusers' prompt_2 does
        (CLIP pools `prompts`, T5 encodes `prompts_2`) — the corrector's
        standalone sampler feeds the original prompt to CLIP and the
        reflection-suffixed one to T5
        (/root/reference/train_flux/sample.py:158-170).

        Under `enable_phase_swap`, embeddings are cached per
        ((clip_prompt, t5_prompt), L): only cache misses touch the text
        encoders, which are uploaded for the miss batch and freed again
        before the DiT phase."""
        if prompts_2 is not None and len(prompts_2) != len(prompts):
            raise ValueError(
                f"prompts_2 must pair 1:1 with prompts: got {len(prompts_2)} vs {len(prompts)}"
            )
        pairs = list(zip(prompts, prompts_2 if prompts_2 is not None else prompts))
        cache = getattr(self, "_embed_cache", None)
        if cache is None:
            return self._encode_raw(pairs, max_sequence_length)
        misses = sorted({pr for pr in pairs if (pr, max_sequence_length) not in cache})
        if misses:
            hold = getattr(self, "_hold_encoders", False)
            for n in self._swap:
                self._ensure_on_device(n)
            txt_m, pooled_m = self._encode_raw(misses, max_sequence_length)
            txt_m = np.asarray(txt_m)
            pooled_m = np.asarray(pooled_m)
            for i, pr in enumerate(misses):
                cache[(pr, max_sequence_length)] = (txt_m[i], pooled_m[i])
            # bounded: refined-prompt loops mint new prompts every round and
            # would otherwise leak ~4 MB of host RAM per prompt forever.
            # Never evict keys the CURRENT call is about to read.
            needed = {(pr, max_sequence_length) for pr in pairs}
            while len(cache) > self._embed_cache_cap:
                victim = next((k for k in cache if k not in needed), None)
                if victim is None:
                    break  # everything left is in-flight; allow overflow
                cache.pop(victim)
            if not hold:
                for n in self._swap:
                    self._offload(n)
        txt = np.stack([cache[(pr, max_sequence_length)][0] for pr in pairs])
        pooled = np.stack([cache[(pr, max_sequence_length)][1] for pr in pairs])
        return jnp.asarray(txt), jnp.asarray(pooled)

    def warm_prompt_cache(self, prompts: Sequence[str], max_sequence_length: int = 512, batch: int = 16) -> None:
        """Encode every prompt once (batched) so later `generate` calls never
        need the text encoders on device — the encode-all / drop-T5 /
        run-DiT-rounds phase structure for fixed-prompt search loops. The
        encoders upload ONCE for the whole warm, not per batch."""
        uniq = sorted(set(prompts))
        self._hold_encoders = True
        try:
            for i in range(0, len(uniq), batch):
                self.encode_prompts(uniq[i : i + batch], max_sequence_length)
        finally:
            self._hold_encoders = False
            for n in getattr(self, "_swap", ()):
                self._offload(n)

    def _encode_raw(self, pairs: Sequence, max_sequence_length: int):
        # each entry is (clip_prompt, t5_prompt) — identical unless the
        # caller split the towers via prompts_2; bare strings also accepted
        pairs = [(p, p) if isinstance(p, str) else p for p in pairs]
        t5_in = self.t5_tokenizer([t for _, t in pairs], max_length=max_sequence_length)
        txt = t5_encode(self.params["t5"], self.t5_cfg, jnp.asarray(t5_in["input_ids"]))
        clip_in = self.clip_tokenizer([c for c, _ in pairs], max_length=self.clip_cfg.max_position_embeddings)
        _, pooled = clip_text_encode(self.params["clip"], self.clip_cfg, jnp.asarray(clip_in["input_ids"]))
        return txt.astype(self.dtype), pooled.astype(self.dtype)

    # -- generation ---------------------------------------------------------

    def generate(
        self,
        prompts: Sequence[str],
        height: int = 1024,
        width: int = 1024,
        num_inference_steps: int = 30,
        guidance_scale: float = 3.5,
        max_sequence_length: int = 512,
        seed: int | None = 0,
        latents: jnp.ndarray | None = None,
        conditions: list[Condition] | None = None,
        condition_scale: float = 1.0,
        image_guidance_scale: float = 1.0,
        output_type: str = "np",
        txt: jnp.ndarray | None = None,
        pooled: jnp.ndarray | None = None,
        prompts_2: Sequence[str] | None = None,
    ):
        """Sample images. Returns uint8 images (B, H, W, 3) for 'np', raw
        packed latents for 'latent'.

        `latents` injection (packed (B, L, C)) bypasses seeding — the
        determinism contract: same latents -> same images. `prompts_2`
        splits the text towers (diffusers prompt_2 semantics — see
        `encode_prompts`)."""
        B = len(prompts)
        down = self.vae_cfg.downscale
        ty, tx = latent_tokens(height, width, down)
        if latents is None:
            if seed is None:  # fresh entropy when the caller doesn't pin one
                import secrets

                seed = secrets.randbits(31)
            latents = draw_packed_noise(
                jax.random.PRNGKey(seed), B, height, width, self.vae_cfg.latent_channels, self.dtype,
                vae_downscale=down,
            )
        if txt is None or pooled is None:
            txt, pooled = self.encode_prompts(prompts, max_sequence_length, prompts_2=prompts_2)
        img_ids = jnp.asarray(make_image_ids(ty, tx))
        txt_ids = jnp.asarray(make_text_ids(txt.shape[1]))
        sigmas = make_schedule(num_inference_steps, ty * tx)

        cond = cond_ids = cond_empty = None
        if conditions:
            cond, cond_ids = encode_conditions(
                conditions, self.params["vae"], self.vae_cfg, self.dtype, tiled=self.vae_tiling
            )
            if image_guidance_scale != 1.0:
                cond_empty, _ = encode_conditions(
                    conditions, self.params["vae"], self.vae_cfg, self.dtype, empty=True,
                    tiled=self.vae_tiling,
                )

        if self.mesh is not None and B % self.mesh.shape["data"] == 0:
            from ..parallel.mesh import candidate_sharding

            sh = candidate_sharding(self.mesh)
            latents = jax.device_put(latents, sh)
            txt = jax.device_put(txt, sh)
            pooled = jax.device_put(pooled, sh)
            if cond is not None:
                cond = jax.device_put(cond, sh)
            if cond_empty is not None:
                cond_empty = jax.device_put(cond_empty, sh)
        elif self.mesh is not None:
            import warnings

            warnings.warn(
                f"batch {B} not divisible by data axis {self.mesh.shape['data']}; "
                "running unsharded (use parallel.mesh.pad_candidates)",
                stacklevel=2,
            )
        vc_kwargs = vcache_kwargs(self.vcache, num_inference_steps)
        final = denoise(
            self.params["dit"],
            self.dit_cfg,
            latents.astype(self.dtype),
            txt,
            pooled,
            img_ids,
            txt_ids,
            sigmas,
            jnp.asarray(guidance_scale, jnp.float32),
            num_inference_steps,
            cond=cond,
            cond_ids=cond_ids,
            cond_empty=cond_empty,
            image_guidance_scale=image_guidance_scale,
            c_factor=None if condition_scale == 1.0 else float(condition_scale),
            cond_dit_params=self.cond_dit_params if conditions else None,
            union_cond_attn=self.model_flags.get("union_cond_attn", True),
            add_cond_attn=self.model_flags.get("add_cond_attn", False),
            attn_impl=self.attn_impl,
            rope_layout=self.rope_layout,
            **vc_kwargs,
        )
        if output_type == "latent":
            return final
        grid = unpack_latents(final, ty, tx)
        if self.vae_tiling:
            from ..models.flux.vae import vae_decode_tiled

            images = vae_decode_tiled(self.params["vae"]["decoder"], self.vae_cfg, grid)
        else:
            images = vae_decode(self.params["vae"]["decoder"], self.vae_cfg, grid)
        images = jnp.clip((images.astype(jnp.float32) + 1.0) * 127.5, 0, 255).astype(jnp.uint8)
        if output_type == "jax":
            # async handle (a few MB of uint8 on device): callers dispatch
            # several micro-batches back-to-back and fetch in order, so the
            # host image fetch/save overlaps the next chunk's denoise
            return images
        return np.asarray(jax.device_get(images))
