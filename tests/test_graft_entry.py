"""Driver-gate protection: entry() compiles and dryrun_multichip runs.

These mirror what the round driver executes; a change that breaks either
should fail the suite, not the round.
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def test_entry_forward():
    import __graft_entry__ as g

    fn, args = g.entry()
    out = fn(*args)
    assert out.shape == (8, 6)


def test_dryrun_multichip_8():
    import jax

    import __graft_entry__ as g

    assert len(jax.devices()) >= 8  # conftest forces 8 virtual devices
    g.dryrun_multichip(8)
