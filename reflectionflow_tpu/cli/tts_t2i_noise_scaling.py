"""Stage-1 noise-scaling CLI (config #1 of BASELINE.json).

Usage mirrors `/root/reference/tts/tts_t2i_noise_scaling.py`:
  python -m reflectionflow_tpu.cli.tts_t2i_noise_scaling \
      --pipeline_config_path configs/flux.1_dev_fake.json \
      --meta_path geneval/evaluation_metadata.jsonl --output_dir out/
"""

from __future__ import annotations

from ..search.noise_scaling import run_noise_scaling
from ..utils.timing import PhaseTimer
from .common import build_parser, load_config, load_pipeline, load_prompts, print_throughput


def main(argv=None):
    args = build_parser(__doc__).parse_args(argv)
    cfg = load_config(args)
    prompts = load_prompts(args)
    pipe = load_pipeline(cfg, args)
    timer = PhaseTimer()
    run_noise_scaling(
        pipe, cfg, prompts, cfg.output_dir, start_index=args.start_index,
        run_seed=args.seed, timer=timer,
    )
    print(timer.summary())
    print_throughput(timer, pipe)


if __name__ == "__main__":
    main()
