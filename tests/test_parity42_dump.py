"""Pinned-4.2 parity assertions, armed by a checked-in dump.

The reference pins opencv-python==4.2.0.32 on python 3.8
(/root/reference/requirements_optical_flow.txt:3); this sandbox has
neither docker nor network, so the dump half of
benchmarks/parity42_harness.py cannot run here.  Whoever can run

    bash benchmarks/make_parity42_dump.sh

once (any machine with docker) produces benchmarks/parity42.npz; from
then on this test turns every row of docs/PARITY_42.md's per-op table
into a hard assertion.  Without the dump the whole module skips loudly.
"""

import importlib.util
import os

import pytest

_BENCH = os.path.join(os.path.dirname(__file__), os.pardir, "benchmarks")
DUMP = os.path.abspath(os.path.join(_BENCH, "parity42.npz"))

pytestmark = pytest.mark.skipif(
    not os.path.exists(DUMP),
    reason="no pinned-4.2 dump checked in — produce one with "
           "`bash benchmarks/make_parity42_dump.sh` (docker + network)")


@pytest.fixture(scope="module")
def parity_rows():
    spec = importlib.util.spec_from_file_location(
        "parity42_harness", os.path.join(_BENCH, "parity42_harness.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    ver, rows = mod.check_rows(DUMP)
    return ver, rows


def test_dump_is_the_pinned_oracle(parity_rows):
    ver, _ = parity_rows
    assert ver.startswith("4.2"), (
        "dump was produced with cv2 %s, not the pinned 4.2.0.32 — "
        "re-run benchmarks/make_parity42_dump.sh" % ver)


def test_every_op_matches_pinned_cv2(parity_rows):
    _, rows = parity_rows
    bad = [name for name, ok in rows if not ok]
    assert not bad, "pinned-4.2 mismatches: %s" % ", ".join(bad)
