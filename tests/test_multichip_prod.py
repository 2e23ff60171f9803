"""Production-shape multi-chip validation: the FULL train step at the
real model dims — DiT-S/2 hidden 384 / heads 6 / SATRN d_model 1536,
latent 64, source 512 (reference ``cross_model.py:766-767``) — sharded
over an 8-device (data=4, model=2) mesh.  The tiny-dim dryrun validates
the sharding mechanics every round; this proves TP divisibility and
collective layouts hold at production shapes (VERDICT r2 item 4)."""

import jax
import pytest

pytestmark = pytest.mark.slow


def test_dryrun_full_production_shapes():
    assert jax.device_count() == 8
    import os
    import sys

    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    import __graft_entry__ as g

    # in-process: conftest already forces the 8-device CPU platform, so
    # no subprocess re-exec happens inside dryrun_multichip
    g.dryrun_multichip(8, full_shapes=True)
