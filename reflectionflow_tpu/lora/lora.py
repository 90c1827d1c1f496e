"""LoRA as weight-space deltas — no context managers, no module mutation.

An adapter is a flat dict {param_path: {"A": (..., in, r), "B": (..., r, out)}}
over stacked block leaves. Two pure transforms:

  * `fold_lora(params, lora, scale)` -> new tree with W + scale*(alpha/r)*A@B;
  * `make_dit_param_views(params, lora, latent_lora)` -> (main, cond) trees
    implementing the reference's `enable_lora` gating
    (/root/reference/train_flux/flux/lora_controller.py:5-42 as exercised in
    block.py/transformer.py): the trained corrector adapter targets only the
    image-stream/shared projections, and with `latent_lora=False` those
    weights stay base for the image stream while the **condition stream**
    (whose q/k/v/out/mlp/modulation calls sit outside the reference's gates)
    sees the adapted weights. Functionally: main tree = base (or fully
    folded when latent_lora=True), cond tree = folded.

The target set mirrors the corrector's target_modules regex
(/root/reference/train_flux/config.yaml:49-53): x_embedder; double-block
img-side norm1.linear, attn q/k/v/out, ff fc2; single-block mod, attn q/k/v,
proj_mlp, proj_out. Text-side projections are never adapted.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..utils.tree import tree_paths, update_path


def corrector_target_paths() -> tuple[str, ...]:
    return (
        "img_in/w",
        "double_blocks/img_mod/w",
        "double_blocks/attn/q/w",
        "double_blocks/attn/k/w",
        "double_blocks/attn/v/w",
        "double_blocks/attn/out/w",
        "double_blocks/img_mlp/fc2/w",
        "single_blocks/mod/w",
        "single_blocks/attn/q/w",
        "single_blocks/attn/k/w",
        "single_blocks/attn/v/w",
        "single_blocks/mlp_in/w",
        "single_blocks/out/w",
    )


def _match(path: str, targets: tuple[str, ...]) -> bool:
    return any(path.endswith(t) or t in path for t in targets)


def lora_init(
    key: jax.Array,
    params,
    r: int = 32,
    alpha: float = 32.0,
    targets: tuple[str, ...] = None,
    init: str = "gaussian",
    dtype=jnp.float32,
) -> dict:
    """Create a zero-effect adapter (B=0) for every matching weight."""
    targets = targets or corrector_target_paths()
    lora = {"_alpha": float(alpha), "_r": int(r)}
    adapters = {}
    for path, leaf in tree_paths(params):
        if not _match(path, targets) or leaf.ndim < 2:
            continue
        key, sub = jax.random.split(key)
        if leaf.ndim == 3:  # stacked blocks (N, in, out)
            N, d_in, d_out = leaf.shape
            a_shape, b_shape = (N, d_in, r), (N, r, d_out)
        else:
            d_in, d_out = leaf.shape
            a_shape, b_shape = (d_in, r), (r, d_out)
        std = 1.0 / r if init == "gaussian" else 0.0
        adapters[path] = {
            "A": (jax.random.normal(sub, a_shape) * std).astype(dtype),
            "B": jnp.zeros(b_shape, dtype),
        }
    lora["adapters"] = adapters
    return lora


def _delta(leaf, ab, scaling, dtype):
    A = ab["A"].astype(jnp.float32)
    B = ab["B"].astype(jnp.float32)
    if leaf.ndim == 3:
        d = jnp.einsum("nir,nro->nio", A, B)
    else:
        d = A @ B
    return (scaling * d).astype(dtype)


def fold_lora(params, lora: dict, scale: float = 1.0):
    """W' = W + scale * (alpha/r) * A@B for every adapter entry."""
    scaling = scale * lora["_alpha"] / lora["_r"]
    out = params
    for path, ab in lora["adapters"].items():
        leaf = _get_path(params, path)
        out = update_path(out, path, leaf + _delta(leaf, ab, scaling, leaf.dtype))
    return out


def _get_path(tree, path: str):
    node = tree
    for part in path.split("/"):
        node = node[int(part)] if isinstance(node, (list, tuple)) else node[part]
    return node


def attach_lora(params, lora: dict, scale: float = 1.0):
    """-> params tree where each adapted linear dict carries `lora_A` /
    `lora_B` (B pre-scaled by scale*alpha/r); `models.flux.dit.linear`
    applies them as low-rank adds `x @ A @ B` WITHOUT materializing
    W + A@B. This is the training-time application: folding copies the
    full 11.9 GB weight tree per step, attaching adds only the rank-r
    factors (the reference's peft layers do the same low-rank add).
    Gradients flow to the adapters through the attached leaves."""
    scaling = scale * lora["_alpha"] / lora["_r"]
    out = params
    for path, ab in lora["adapters"].items():
        parent_path = path[: -len("/w")]
        node = dict(_get_path(params, parent_path))
        node["lora_A"] = ab["A"]
        node["lora_B"] = ab["B"] * scaling
        out = update_path(out, parent_path, node)
    return out


def make_dit_param_views(params, lora: dict | None, latent_lora: bool = False, scale: float = 1.0):
    """-> (main_params, cond_params) for `flux_dit_apply`.

    cond_params is what the condition stream reads for its shared-weight ops.
    """
    if lora is None:
        return params, None
    folded = fold_lora(params, lora, scale)
    if latent_lora:
        return folded, folded
    return params, folded


def lora_param_count(lora: dict) -> int:
    return sum(int(np.prod(x.shape)) for ab in lora["adapters"].values() for x in ab.values())


def save_lora_adapter(path: str, lora: dict) -> None:
    """One-file adapter interchange: the {_alpha,_r,adapters} tree as a
    safetensors file (flat `{path with / as __}.A/.B` keys + 0-d _alpha/_r).
    This is how a finetuned Reflection-Generator adapter ships (the
    reference serves qwen2_vl + a LLaMA-Factory LoRA,
    /root/reference/tts/configs/our_reflectionmodel.yaml); consumed by
    `models.qwen_vl.generate.QwenVLGenerator.from_pretrained`."""
    from safetensors.numpy import save_file

    flat = {
        "_alpha": np.asarray(lora["_alpha"], np.float32),
        "_r": np.asarray(lora["_r"], np.float32),
    }
    for p, ab in lora["adapters"].items():
        safe = p.replace("/", "__")
        flat[f"{safe}.A"] = np.ascontiguousarray(np.asarray(ab["A"], np.float32))
        flat[f"{safe}.B"] = np.ascontiguousarray(np.asarray(ab["B"], np.float32))
    save_file(flat, path)


def load_lora_adapter(path: str) -> dict:
    """Inverse of `save_lora_adapter` -> a tree `fold_lora`/`attach_lora` accept."""
    from safetensors.numpy import load_file

    flat = load_file(path)
    adapters: dict = {}
    for k, v in flat.items():
        if k in ("_alpha", "_r"):
            continue
        p, which = k.rsplit(".", 1)
        adapters.setdefault(p.replace("__", "/"), {})[which] = v
    return {"_alpha": float(flat["_alpha"]), "_r": float(flat["_r"]), "adapters": adapters}


# ---------------------------------------------------------------------------
# diffusers-peft checkpoint conversion
# ---------------------------------------------------------------------------

_DIFFUSERS_TO_PATH = {
    "x_embedder": "img_in/w",
    "norm1.linear": "img_mod/w",
    "attn.to_q": "attn/q/w",
    "attn.to_k": "attn/k/w",
    "attn.to_v": "attn/v/w",
    "attn.to_out.0": "attn/out/w",
    "ff.net.2": "img_mlp/fc2/w",
    "norm.linear": "mod/w",
    "proj_mlp": "mlp_in/w",
    "proj_out": "out/w",
}


def convert_diffusers_lora(sd: dict[str, np.ndarray], num_double: int, num_single: int, alpha: float | None = None) -> dict:
    """FluxPipeline.save_lora_weights checkpoint -> our stacked adapter dict.

    Keys look like `transformer.single_transformer_blocks.0.attn.to_k.lora_A.weight`
    with torch (out, in) layout: lora_A (r, in) -> our A = A.T (in, r);
    lora_B (out, r) -> our B = B.T (r, out).
    """
    sd = {k.removeprefix("transformer."): v for k, v in sd.items()}
    r = None
    per_path: dict[str, dict[int, dict[str, np.ndarray]]] = {}
    top_level: dict[str, dict[str, np.ndarray]] = {}
    for key, val in sd.items():
        if ".lora_A." in key or ".lora_B." in key:
            which = "A" if ".lora_A." in key else "B"
            module = key.split(".lora_")[0]
            mat = val.T  # (in, r) or (r, out)
            r = mat.shape[1] if which == "A" else mat.shape[0]
            if module.startswith("transformer_blocks.") or module.startswith("single_transformer_blocks."):
                parts = module.split(".")
                family = "double_blocks" if parts[0] == "transformer_blocks" else "single_blocks"
                idx = int(parts[1])
                sub = ".".join(parts[2:])
                path = f"{family}/{_DIFFUSERS_TO_PATH[sub]}"
                per_path.setdefault(path, {}).setdefault(idx, {})[which] = mat
            else:
                path = _DIFFUSERS_TO_PATH[module]
                top_level.setdefault(path, {})[which] = mat
    adapters = {}
    for path, by_idx in per_path.items():
        n = num_double if path.startswith("double_blocks") else num_single
        d_in = by_idx[next(iter(by_idx))]["A"].shape[0]
        d_out = by_idx[next(iter(by_idx))]["B"].shape[1]
        A = np.zeros((n, d_in, r), np.float32)
        B = np.zeros((n, r, d_out), np.float32)
        for idx, ab in by_idx.items():
            A[idx] = ab["A"]
            B[idx] = ab["B"]
        adapters[path] = {"A": A, "B": B}
    for path, ab in top_level.items():
        adapters[path] = {"A": ab["A"].astype(np.float32), "B": ab["B"].astype(np.float32)}
    return {"_alpha": float(alpha if alpha is not None else r), "_r": int(r), "adapters": adapters}
