"""Deterministic PRNG plumbing.

The reference derives per-candidate noise from random int32 seeds fed to the
host RNG (`/root/reference/tts/utils.py:131-155`). The TPU-native contract is
simpler and fully deterministic: one root `jax.random.PRNGKey` per run,
`fold_in` per (prompt, round, candidate). Bit-exact torch parity is out of
scope (BASELINE.json scopes parity to "same latents -> same images"), so
samplers also accept externally injected latents.
"""

from __future__ import annotations

import jax


def candidate_key(root: jax.Array, prompt_idx: int, round_idx: int, cand_idx: int) -> jax.Array:
    k = jax.random.fold_in(root, prompt_idx)
    k = jax.random.fold_in(k, round_idx)
    return jax.random.fold_in(k, cand_idx)


def seed_to_key(seed: int) -> jax.Array:
    return jax.random.PRNGKey(seed)
