"""Run logger: colored console + timestamped file in the output dir
(parity with reference utils.py:253-270)."""
import logging
import os
import sys
import time

logger = logging.getLogger("dipoorlet_tpu")

_COLORS = {"green": "\033[32m", "yellow": "\033[33m", "reset": "\033[0m"}


def setup_logger(args):
    fmt = "[%(asctime)s %(name)s] (%(filename)s %(lineno)d): %(levelname)s %(message)s"
    color_fmt = (f"{_COLORS['green']}[%(asctime)s %(name)s]{_COLORS['reset']}"
                 f"{_COLORS['yellow']}(%(filename)s %(lineno)d){_COLORS['reset']}"
                 ": %(levelname)s %(message)s")
    logger.setLevel(logging.INFO)
    # idempotent: repeated CLI invocations in one process (tests, sweeps)
    # must not stack handlers and duplicate every line
    for h in list(logger.handlers):
        logger.removeHandler(h)
        h.close()
    log_file = os.path.join(args.output_dir,
                            "log-{}.txt".format(time.strftime("%Y-%m-%d-%H-%M-%S")))
    with open(log_file, "w") as f:
        f.write(str(args) + "\n")
    fh = logging.FileHandler(log_file)
    fh.setLevel(logging.INFO)
    fh.setFormatter(logging.Formatter(fmt=fmt, datefmt="%Y-%m-%d %H:%M:%S"))
    logger.addHandler(fh)
    ch = logging.StreamHandler(sys.stdout)
    ch.setLevel(logging.INFO)
    ch.setFormatter(logging.Formatter(fmt=color_fmt, datefmt="%Y-%m-%d %H:%M:%S"))
    logger.addHandler(ch)
