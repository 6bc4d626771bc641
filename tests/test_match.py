"""Engine-vs-engine integration match over the GTP subprocess harness.

The minimal self-match (tiny rollouts, 10 moves) runs in the DEFAULT suite
so every round exercises boke.py over real pipes (gtp.py:533-604 is how the
reference was evaluated).  Set BOKEGO_SKIP_SLOW=1 to opt out.
"""

import os
import sys

import pytest

from bokego_tpu import sgf
from bokego_tpu.gtp.process import gtp_match

pytestmark = pytest.mark.skipif(
    os.environ.get("BOKEGO_SKIP_SLOW"), reason="BOKEGO_SKIP_SLOW set"
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
