"""Driver contract: entry() compiles; dryrun_multichip runs on 8 devices."""

import sys
from pathlib import Path

import jax

sys.path.insert(0, str(Path(__file__).parent.parent))


def test_entry_compiles():
    import __graft_entry__ as g

    fn, args = g.entry()
    out = jax.jit(fn)(*args)
    shapes = [o.shape for o in out]
    assert shapes[0] == (2, 30, 40, 65)
    assert shapes[1] == (2, 30, 40, 256)
    assert shapes[2] == (2, 240, 320, 133)


def test_dryrun_multichip():
    import __graft_entry__ as g

    g.dryrun_multichip(len(jax.devices()))
