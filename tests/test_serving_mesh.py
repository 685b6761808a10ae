"""The SHIPPED serving composition over a multi-device mesh (VERDICT r4
item 4): fused batched front-end + i16 audio decode + μ-law/f16 codecs +
mesh-divisible right-sized slots + pipeline_depth 2, each request matching
its solo direct-path result. The same check runs in the driver's
dryrun_multichip; this test keeps it in the suite."""
import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@pytest.mark.slow
def test_fused_serving_composition_over_mesh():
    import __graft_entry__ as graft

    msg = graft.fused_serving_composition_check(2)
    assert "fused-serving composition over 2 devices ok" in msg
