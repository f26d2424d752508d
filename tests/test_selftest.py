"""The on-device kernel selftest harness (bench.py --selftest) must run
end-to-end and pass — on CPU it self-downgrades to interpret mode, which
keeps the harness itself (case wiring, tolerances, verdict JSON) under CI
while hardware runs carry the real Mosaic signal."""

import numpy as np
import pytest


@pytest.mark.slow
def test_selftest_green_and_complete():
    from optical_flow_tpu.utils.selftest import _cases, run_selftest
    # hardware runs the full list: every kernel, several shape classes
    assert len(_cases(quick=False)) >= 13
    v = run_selftest()                     # CPU: quick interpret subset
    assert v["interpret"] is True
    assert v["n_cases"] >= 7               # one case per kernel + colorize
    failed = [c for c in v["cases"] if not c["ok"]]
    assert not failed, failed
    assert v["ok"] and v["n_failed"] == 0
    # every case carries a concrete measured diff (not just a bool)
    for c in v["cases"]:
        assert "max_abs_diff" in c, c
        assert np.isfinite(c["max_abs_diff"])
