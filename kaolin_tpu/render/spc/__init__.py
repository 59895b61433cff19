from kaolin_tpu.render.spc.raytrace import (  # noqa: F401
    cumprod,
    cumsum,
    diff,
    exponential_integration,
    mark_first_hit,
    mark_pack_boundaries,
    prod_reduce,
    sum_reduce,
    unbatched_raytrace,
    raytrace_overflow_report,
)
