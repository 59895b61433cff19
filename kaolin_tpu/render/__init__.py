from kaolin_tpu.render import camera  # noqa: F401
