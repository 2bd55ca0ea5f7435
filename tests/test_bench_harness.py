"""Contract tests for the bench driver (the judged artifact producer).

No device timing here — these protect the *shape* of the record: the
case enumeration used for per-case subprocess isolation, and the
headline config keys the artifact promises.
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import bench  # noqa: E402


def test_kernel_matrix_case_names_stable():
    names = bench.bench_kernels(collect=True)
    assert len(names) == len(set(names)) >= 20
    # the rows VERDICT r1 flagged as missing must be enumerated, and the
    # hang-prone dc_blocker must come last so it can never block others
    for required in ("u8_front_k51_d8_int8", "resample_r_3_4",
                     "convert_u8", "scale", "fft_1024_batch",
                     "dc_blocker", "filter_r_k512_pallas",
                     "decimate_r_k51_d8_conv"):
        assert required in names, required
    assert names[-1] == "dc_blocker"


def test_headline_config_is_self_describing():
    cfg = bench.HEADLINE_CONFIG
    for key in ("formulation", "front", "atan2", "method", "nblocks",
                "block_u8", "timing"):
        assert key in cfg, key
    import json
    json.dumps(cfg)  # must serialize into the artifact


def test_collect_mode_touches_no_device(monkeypatch):
    """Name enumeration must not allocate device buffers (it runs in the
    parent process before any subprocess isolation)."""
    import jax

    def boom(*a, **k):  # pragma: no cover - should never fire
        raise AssertionError("device array built in collect mode")

    monkeypatch.setattr(jax.numpy, "asarray", boom)
    names = bench.bench_kernels(collect=True)
    assert names
