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

pytestmark = [
    pytest.mark.slow,  # full e2e subprocess matches (~90s)
    pytest.mark.skipif(
        os.environ.get("BOKEGO_SKIP_SLOW"), reason="BOKEGO_SKIP_SLOW set"
    ),
]


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


def test_referee_forfeits_midgame_impossible_move(tmp_path):
    """ADVICE r2 (low): a mid-game impossible move is scored as a forfeit
    against the offender, and the SGF says so."""
    out = os.path.join(tmp_path, "forfeit.sgf")
    # black: a trivial scripted GTP engine that plays A1, then A1 again
    # (occupied -> impossible on the true board)
    script = tmp_path / "bad_engine.py"
    script.write_text(
        "import sys\n"
        "n = 0\n"
        "for line in sys.stdin:\n"
        "    cmd = line.split()[0] if line.split() else ''\n"
        "    if cmd == 'protocol_version': print('= 2', end='\\n\\n')\n"
        "    elif cmd == 'genmove':\n"
        "        n += 1\n"
        "        print('= A1', end='\\n\\n')\n"
        "    elif cmd == 'quit':\n"
        "        print('=', end='\\n\\n'); sys.stdout.flush(); break\n"
        "    else: print('=', end='\\n\\n')\n"
        "    sys.stdout.flush()\n"
    )
    good = f"{sys.executable} boke.py -r 4 --no-ponder"
    won = gtp_match(
        f"{sys.executable} {script}", good, sgf_path=out, max_moves=40
    )
    assert won is False  # black forfeited
    text = open(out).read()
    assert "RE[W+F]" in text
    assert "truncated" in text
