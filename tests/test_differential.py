"""Differential testing: random well-typed miniGQL programs agree with
an independent pure-Python list interpreter of the same semantics
(tools/diff_fuzz.py — binding table, node attributes, edge set).

The in-suite soak covers 200 programs (round-5 verdict item 5's bar)
including variable rebinding and `/`/`mod`; soak wider with
``python tools/diff_fuzz.py 500 <seed>``.
"""

import os
import random
import re
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))

from diff_fuzz import gen_program, run_one


def test_random_programs_match_model(spark):
    rng = random.Random(20260814)
    divergences = []
    n_rebind = n_divmod = 0
    for trial in range(200):
        text = gen_program(rng)
        binds = re.findall(r"(?:create|match) \((\w+):", text)
        if len(binds) != len(set(binds)):
            n_rebind += 1
        if " mod " in text or " / " in text:
            n_divmod += 1
        ok, detail = run_one(spark, text)
        assert ok is not None, f"generator slip:\n{text}\n{detail}"
        if not ok:
            divergences.append((text, detail))
    assert not divergences, divergences[0]
    # the corpus must actually exercise the hard envelope, not dodge it
    assert n_rebind >= 30, n_rebind
    assert n_divmod >= 20, n_divmod
