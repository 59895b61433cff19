from kaolin_tpu.math import quat  # noqa: F401
