"""The driver checks exactly the first 50 queries() entries per round;
the in-dict comment marker documents that boundary for rotation/audit.
ADVICE r11: phrase_match was once inserted into the window region
without moving the marker, so entry 51 read as in-window. Pin the
marker to index 50 so that class of drift fails loudly."""

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entry_mod

WINDOW = 50


def test_window_marker_sits_after_exactly_50_entries():
    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "__spark_entry__.py",
    )
    src = open(path).read().splitlines()
    start = next(i for i, l in enumerate(src) if l.startswith("def queries()"))
    open_i = next(
        i for i in range(start, len(src)) if src[i].rstrip() == "    return {"
    )
    close_i = next(
        i for i in range(open_i, len(src)) if src[i].rstrip() == "    }"
    )
    n_before_marker = None
    count = 0
    for line in src[open_i + 1 : close_i]:
        if "end of driver-checked window" in line:
            assert n_before_marker is None, "duplicate window marker"
            n_before_marker = count
        elif re.match(r'^        "[a-z0-9_]+": ', line):
            count += 1
    assert n_before_marker == WINDOW, (
        f"window marker sits after {n_before_marker} entries, expected "
        f"{WINDOW} — regenerate the dict with tools/apply_rotation.py"
    )
    # and the parsed dict agrees with the source ordering the marker cuts
    assert count == len(entry_mod.queries())
