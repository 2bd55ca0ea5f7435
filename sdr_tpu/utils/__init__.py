from sdr_tpu.utils.args import parse_size  # noqa: F401
from sdr_tpu.utils.host import to_host, from_host  # noqa: F401
from sdr_tpu.utils.device import (  # noqa: F401
    device_kind,
    on_tpu,
    best_method,
    feature_select,
)
from sdr_tpu.utils.profiling import trace, profile, timed  # noqa: F401
from sdr_tpu.utils.roofline import (  # noqa: F401
    chain_roofline,
    stage_costs,
    Ceilings,
    MEASURED_CEILINGS,
)
