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
