"""Differential testing: random well-typed miniGQL programs agree with
an independent pure-Python list interpreter of the same semantics
(tools/diff_fuzz.py — binding table, node attributes, edge set).

The in-suite budget is small; soak with
``python tools/diff_fuzz.py 500 <seed>``.
"""

import os
import random
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))

from diff_fuzz import gen_program, run_one


def test_random_programs_match_model(spark):
    rng = random.Random(20260814)
    divergences = []
    for trial in range(20):
        text = gen_program(rng)
        ok, detail = run_one(spark, text)
        assert ok is not None, f"generator slip:\n{text}\n{detail}"
        if not ok:
            divergences.append((text, detail))
    assert not divergences, divergences[0]
