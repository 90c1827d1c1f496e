"""Measure the block-pipelining win: --parallel_blocks overlap vs serial.

The reflection round's critical path is verify -> reflect -> refine ->
generate. With a REMOTE verifier (OpenAI API), the device idles during the
host's API round-trips; `--parallel_blocks N` threads N prompt blocks so
one block's host stages overlap another block's device generation
(`cli/tts_reflectionflow.py`). The reference's loop is strictly serial per
prompt over the same HTTP calls (/root/reference/tts/tts_reflectionflow.py:94-465).

This demo runs the hermetic tiny-model loop (CPU by default, identical
code path on TPU) with a FakeVerifier configured to sleep `delay_s` per
score call — the API-latency stand-in — and times the whole run serial
(parallel_blocks=1) vs overlapped (parallel_blocks=2). Prints one JSON
line; the overlapped run should hide most of each round's verifier delay
behind the other block's generation.

Usage: python tools/pipeline_overlap_demo.py [delay_s] [n_prompts]
"""

import json
import sys
import time

sys.path.insert(0, ".")

import jax

# tiny hermetic models: run on CPU (the axon plugin ignores JAX_PLATFORMS;
# this must precede any device query — CLAUDE.md)
jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402

from reflectionflow_tpu.config import (  # noqa: E402
    CLIPTextConfig, FluxDiTConfig, FluxVAEConfig, T5Config, TTSConfig,
)
from reflectionflow_tpu.reflect import load_reflector, load_refiner  # noqa: E402
from reflectionflow_tpu.sampler.pipeline import FluxPipeline  # noqa: E402
from reflectionflow_tpu.search.reflectionflow import run_reflectionflow_block  # noqa: E402
from reflectionflow_tpu.utils.timing import PhaseTimer  # noqa: E402
from reflectionflow_tpu.verifiers.fake import FakeVerifier  # noqa: E402


def run(pipe, cfg, prompts, out_root, delay_s, parallel):
    import concurrent.futures as cf

    verifier = FakeVerifier(delay_s=delay_s)
    reflector = load_reflector("fake")
    refiner = load_refiner("fake")
    timer = PhaseTimer()
    block_size = 1
    starts = list(range(0, len(prompts), block_size))

    def run_block(c0):
        run_reflectionflow_block(
            pipe, verifier, reflector, refiner, cfg,
            [{"prompt": p, "tag": None} for p in prompts[c0 : c0 + block_size]],
            out_root, start_index=c0, run_seed=0, timer=timer,
        )

    t0 = time.perf_counter()
    if parallel > 1:
        with cf.ThreadPoolExecutor(max_workers=parallel) as ex:
            list(ex.map(run_block, starts))
    else:
        for c0 in starts:
            run_block(c0)
    return time.perf_counter() - t0


def main():
    delay_s = float(sys.argv[1]) if len(sys.argv) > 1 else 2.0
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 4

    import tempfile

    cfg = TTSConfig()
    cfg.pipeline_args.height = cfg.pipeline_args.width = 16
    cfg.pipeline_args.condition_size = 8
    cfg.pipeline_args.max_sequence_length = 16
    cfg.pipeline_args.num_inference_steps = 2
    cfg.search_args.search_branch = 2
    cfg.search_args.search_rounds = 2

    pipe = FluxPipeline.random_init(
        jax.random.PRNGKey(0),
        dit_cfg=FluxDiTConfig.tiny(), vae_cfg=FluxVAEConfig.tiny(),
        t5_cfg=T5Config.tiny(), clip_cfg=CLIPTextConfig.tiny(),
        dtype=jnp.float32,
    )
    prompts = [f"prompt {i}" for i in range(n)]

    with tempfile.TemporaryDirectory() as d1:
        # warm compile caches so the comparison measures steady-state
        run(pipe, cfg, prompts[:1], d1, 0.0, 1)
    with tempfile.TemporaryDirectory() as d1:
        t_serial = run(pipe, cfg, prompts, d1, delay_s, 1)
    with tempfile.TemporaryDirectory() as d2:
        t_overlap = run(pipe, cfg, prompts, d2, delay_s, 2)
    print(json.dumps({
        "n_prompts": n, "rounds": cfg.search_args.search_rounds,
        "verify_delay_s": delay_s,
        "serial_s": round(t_serial, 2),
        "parallel_blocks2_s": round(t_overlap, 2),
        "speedup": round(t_serial / t_overlap, 3),
        "note": "FakeVerifier(delay_s) stands in for remote-API latency; "
                "threads overlap one block's verify with another's generate",
    }))


if __name__ == "__main__":
    main()
