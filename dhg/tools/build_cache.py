"""CLI: prebuild the packed IAM cache (train + validation) for a config.

    python -m dhg.tools.build_cache --config=best.yml [--kind=train] \
        [--workers=8]

Separates the one-time offline cost (XML parsing, image IO, MobileNetV2
style extraction) from training startup; training then memory-maps the
packed arrays straight to device. Forms are processed on a thread pool
(--workers, default min(8, cpus); the native XML scanner and cv2 release
the GIL) — the cache is identical for every worker count.
"""

from __future__ import annotations

import sys

from dhg.config import DLConfig, fit_config, parse_cli_kwargs
from dhg.data.iam import load_or_build_cache
from dhg.utils.log import get_logger


def main(argv=None) -> None:
    kwargs = parse_cli_kwargs(argv if argv is not None else sys.argv[1:], help_text=__doc__)
    kind = kwargs.pop("kind", "train")
    workers = kwargs.pop("workers", None)
    cfg = DLConfig(fit_config(**kwargs))
    logger = get_logger("build_cache")

    cache = load_or_build_cache(
        cache_dir=cfg.training_args.cache_dir or "./data/cache",
        data_dir=cfg.experiment.data_dir,
        kind=kind,
        splits_file=cfg.experiment.splits_file,
        img_height=cfg.dataset_args.img_height or 96,
        img_width=cfg.dataset_args.img_width or 1400,
        max_text_len=cfg.dataset_args.max_text_len or 50,
        max_seq_len=cfg.dataset_args.max_seq_len or 480,
        max_files=cfg.training_args.max_files,
        seed=cfg.experiment.seed or 54321,
        style_weights=cfg.dataset_args.style_weights,
        workers=None if workers is None else int(workers),
    )
    logger.info(f"cache ready: {len(cache)} samples ({kind})")


if __name__ == "__main__":
    main()
