"""Secondary-chip placement helpers.

Serving colocates several multi-GB models (resident DiT + verifier +
reflector); `verifier_args.device_index` / `reflection_args.device_index`
pin a model to another chip — the analogue of the reference's separate
verifier / reflection GPUs (/root/reference/tts/tts_reflectionflow.py:24,
verifiers/nvila_verifier.py:6 `device_map="auto"`). The load recipe must
run ENTIRELY under default_device(target) so no transient (bf16 load
peak, int8 quantize scratch) materializes next to the resident DiT, and
host-loaded numpy leaves must be device_put explicitly (default_device
only places computed arrays). Shared by QwenRewardVerifier,
QwenVLGenerator.from_pretrained and NvilaJaxVerifier.
"""

from __future__ import annotations

import contextlib

import jax


@contextlib.contextmanager
def on_device(device_index: int | None):
    """`jax.default_device(jax.devices()[device_index])` context; yields
    the target device, or None (and a nullcontext) when unpinned."""
    if device_index is None:
        yield None
        return
    dev = jax.devices()[device_index]
    with jax.default_device(dev):
        yield dev


def quantize_blocks(params: dict, min_size: int) -> dict:
    """-> params with its stacked `blocks` leaves W8A8-quantized — the
    int8 serving recipe shared by every LM / vision tower."""
    from ..ops.quant import quantize_dit_params

    return dict(
        params,
        blocks=quantize_dit_params({"b": params["blocks"]}, min_size=min_size)["b"],
    )


def pin(dev, *trees):
    """device_put each tree on `dev` (identity when dev is None); returns
    them in input order, a single tree bare."""
    out = tuple(trees) if dev is None else tuple(jax.device_put(t, dev) for t in trees)
    return out[0] if len(out) == 1 else out
