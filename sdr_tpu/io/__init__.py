"""Host I/O: file and network sources/sinks feeding device pipelines."""

from sdr_tpu.io.files import (  # noqa: F401
    iq_file_source,
    read_iq_file,
    write_iq_file,
    block_sink,
    wav_sink,
    IQ_DTYPES,
)
from sdr_tpu.io.net import udp_source, udp_sink  # noqa: F401
from sdr_tpu.io.rtl_tcp import (  # noqa: F401
    RtlTcpParams,
    RtlTcpSource,
    rtl_tcp_source,
    parse_rtl_tcp_url,
)
from sdr_tpu.io.audio import audio_available, audio_sink  # noqa: F401
from sdr_tpu.io.native import (  # noqa: F401
    native_file_source,
    native_udp_source,
    native_available,
    build_native,
)
from sdr_tpu.io.plot import (  # noqa: F401
    plot_line,
    plot_fill,
    Waterfall,
    zero_axis,
    centered_axis,
)
from sdr_tpu.io.serialize import (  # noqa: F401
    to_bytes,
    from_bytes,
    frame_blocks,
    write_framed,
    read_framed,
)
