"""Logging helpers. Ref ``kaolin/utils/log.py:27,79``."""

import logging

import numpy as np

__all__ = ["default_log_setup", "log_tensor", "tensor_info"]


def default_log_setup(level=logging.INFO):
    """Configure root logging with a sane format. Ref :27."""
    logging.basicConfig(
        level=level,
        format="%(asctime)s|%(levelname)8s| %(message)s",
        datefmt="%Y-%m-%d %H:%M:%S")


def tensor_info(t, name="tensor", print_stats=False, detailed=False):
    """One-line tensor description. Ref ``utils/testing.py:237``."""
    if t is None:
        return f"{name}: None"
    arr = np.asarray(t)
    s = f"{name}: {tuple(arr.shape)} {arr.dtype}"
    if print_stats and arr.size:
        s += (f" min={arr.min():.4g} max={arr.max():.4g}"
              f" mean={arr.mean():.4g}")
    if detailed and arr.size:
        s += f" nans={np.isnan(arr).sum()} infs={np.isinf(arr).sum()}"
    return s


def log_tensor(t, name="tensor", logger=None, level=logging.INFO, **kwargs):
    """Log a tensor description. Ref :79."""
    (logger or logging.getLogger()).log(level, tensor_info(t, name, **kwargs))


def add_log_level_flag(parser):
    """Add a ``--log_level`` argparse flag (int or name). Ref ``log.py``
    (add_log_level_flag)."""
    parser.add_argument(
        "--log_level", type=_str2loglevel, default=logging.INFO,
        help="Logging level: 10 (DEBUG), 20 (INFO), 30 (WARN), 40 (ERROR), "
             "or a level name.")
    return parser


def _str2loglevel(value):
    try:
        return int(value)
    except ValueError:
        level = getattr(logging, str(value).upper(), None)
        if level is None:
            raise ValueError(f"unknown log level {value!r}")
        return level


def print_tensor(t, name="tensor", **kwargs):
    """Print a tensor description (see :func:`tensor_info`). Ref (print_tensor)."""
    print(tensor_info(t, name, **kwargs))
