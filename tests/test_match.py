"""Engine-vs-engine integration match over the GTP subprocess harness.

Slow (two engine subprocesses, each compiling JAX on CPU): opt in with
BOKEGO_RUN_SLOW=1.  The same flow is exercised in the project verify skill.
"""

import os
import sys

import pytest

from bokego_tpu import sgf
from bokego_tpu.gtp.process import gtp_match

pytestmark = pytest.mark.skipif(
    not os.environ.get("BOKEGO_RUN_SLOW"), reason="set BOKEGO_RUN_SLOW=1"
)


def test_self_match(tmp_path):
    out = os.path.join(tmp_path, "match.sgf")
    cmd = (
        f"{sys.executable} boke.py -r 4 --no-ponder"
    )
    env_note = os.environ.setdefault("BOKEGO_TPU_PLATFORM", "cpu")
    del env_note
    won = gtp_match(cmd, cmd, sgf_path=out, max_moves=10)
    assert isinstance(won, bool)
    assert os.path.exists(out)
    moves = sgf.read_moves(out)
    assert len(moves) >= 8
    assert sgf.read_result(out)
