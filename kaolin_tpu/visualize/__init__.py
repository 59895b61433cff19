from kaolin_tpu.visualize.timelapse import Timelapse, TimelapseParser  # noqa: F401
from kaolin_tpu.visualize.ipython import (  # noqa: F401
    BaseIpyVisualizer,
    IpyFirstPersonVisualizer,
    IpyTurntableVisualizer,
    quick_viz,
    update_canvas,
)
