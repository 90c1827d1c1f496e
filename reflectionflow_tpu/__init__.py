"""reflectionflow_tpu — a TPU-native inference-time-scaling framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
Diffusion-CoT/ReflectionFlow (ICCV 2025, arXiv:2504.16080): a FLUX.1-dev
flow-matching sampler with an OminiControl-style condition stream, the three
test-time-scaling search loops (noise scaling, noise+prompt scaling, full
generate->verify->reflect->refine reflection), Qwen2.5-VL based verifier and
reflection generator, and pjit data-parallel LoRA training.

Design principles (TPU-first, not a port):
  * everything on the hot path is a pure function jitted once with static
    shapes; the Euler denoise loop is a `lax.scan`;
  * N candidate trajectories are a batch axis sharded over the ICI mesh
    (`parallel.mesh`), not a serial python loop;
  * the [txt|img|cond] joint attention runs as a fused Pallas kernel
    (`ops.attention`) with an XLA fallback;
  * LoRA adapters are weight-space deltas that can be folded (inference) or
    kept factorized (training) — no context-manager mutation;
  * verifiers are a pure interface with a deterministic fake for hermetic
    tests.
"""

__version__ = "0.1.0"
