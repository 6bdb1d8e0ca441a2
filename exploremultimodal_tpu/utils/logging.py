"""Per-process file + process-0 console logging.

Reference parity: utils/logger.py:10-49 (per-rank file handler
`log_rank{rank}_{node}.txt` + colored stdout on rank 0). Here "rank" is the
JAX process index; single-controller runs get one file.
"""

from __future__ import annotations

import functools
import logging
import os
import sys


@functools.lru_cache(maxsize=None)
def create_logger(
    output_dir: str | None = None,
    process_index: int = 0,
    name: str = "emm_tpu",
    level: str = "info",
) -> logging.Logger:
    logger = logging.getLogger(name)
    logger.setLevel(getattr(logging, level.upper(), logging.INFO))
    logger.propagate = False

    fmt = (
        f"[%(asctime)s p{process_index}] (%(filename)s %(lineno)d): "
        "%(levelname)s %(message)s"
    )
    datefmt = "%Y-%m-%d %H:%M:%S"

    if process_index == 0:
        console = logging.StreamHandler(sys.stdout)
        console.setFormatter(logging.Formatter(fmt, datefmt=datefmt))
        logger.addHandler(console)

    if output_dir:
        os.makedirs(output_dir, exist_ok=True)
        fh = logging.FileHandler(
            os.path.join(output_dir, f"log_p{process_index}.txt"), mode="a"
        )
        fh.setFormatter(logging.Formatter(fmt, datefmt=datefmt))
        logger.addHandler(fh)

    if not logger.handlers:
        logger.addHandler(logging.NullHandler())
    return logger
