from sdr_tpu.utils.args import parse_size  # noqa: F401
from sdr_tpu.utils.host import to_host  # noqa: F401
