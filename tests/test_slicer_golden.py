"""Behavior-freeze goldens for the silence slicer (reference slicer.py:33-117
output contract).

The expected dicts were captured from the validated round-1 implementation on
deterministic synthetic signals covering every state-machine branch: short
input, mid-utterance point cut, long interior silence (two-sided cut),
straddle case (max_sil_kept < span <= 2*max_sil_kept), leading-silence cut,
and trailing-silence cut. Any restructuring of the slicer must reproduce
these exactly.
"""
import json

import numpy as np

from ddsp_svc_tpu.features.slicer import Slicer

SR = 32000


def _mk(sig_spec):
    rng = np.random.default_rng(0)
    parts = []
    for kind, sec in sig_spec:
        n = int(sec * SR)
        scale = 0.3 if kind == "v" else 1e-4
        parts.append(rng.standard_normal(n).astype(np.float32) * scale)
    return np.concatenate(parts)


CASES = {
    "mid_split": [("s", 0.5), ("v", 6.0), ("s", 0.8), ("v", 6.0), ("s", 0.5)],
    "long_silence": [("v", 6.0), ("s", 12.0), ("v", 6.0)],
    "short_all_voiced": [("v", 3.0)],
    "leading_long": [("s", 11.0), ("v", 6.0)],
    "trailing_only": [("v", 6.0), ("s", 2.0)],
    "straddle": [("v", 6.0), ("s", 7.0), ("v", 6.0)],
}

GOLDEN = json.loads("""
{
"mid_split": {"0": {"slice": false, "split_time": "0,224000"},
 "1": {"slice": true, "split_time": "224000,224000"},
 "2": {"slice": false, "split_time": "224000,441600"},
 "3": {"slice": true, "split_time": "441600,441600"}},
"long_silence": {"0": {"slice": false, "split_time": "0,224000"},
 "1": {"slice": true, "split_time": "224000,543360"},
 "2": {"slice": false, "split_time": "543360,768000"}},
"short_all_voiced": {"0": {"slice": false, "split_time": "0,96000"}},
"leading_long": {"0": {"slice": true, "split_time": "0,224000"},
 "1": {"slice": false, "split_time": "224000,544000"}},
"trailing_only": {"0": {"slice": false, "split_time": "0,256000"},
 "1": {"slice": true, "split_time": "256000,256000"}},
"straddle": {"0": {"slice": false, "split_time": "0,224000"},
 "1": {"slice": true, "split_time": "224000,413440"},
 "2": {"slice": false, "split_time": "413440,608000"}}
}
""")


def test_slicer_goldens():
    for name, spec in CASES.items():
        got = Slicer(sr=SR).slice(_mk(spec))
        assert got == GOLDEN[name], f"{name}: {got}"
