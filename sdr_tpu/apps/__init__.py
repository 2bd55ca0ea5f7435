"""Example applications (the reference's examples/, as CLIs)."""

from sdr_tpu.apps.chains import (  # noqa: F401
    fm_taps,
    fm_chain,
    am_chain,
    waterfall_chain,
    channelizer_chain,
)
