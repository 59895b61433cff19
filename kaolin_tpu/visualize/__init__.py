from kaolin_tpu.visualize.timelapse import Timelapse, TimelapseParser  # noqa: F401
