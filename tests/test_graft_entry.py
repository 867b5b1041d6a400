"""Driver contract: dryrun_multichip must jit and execute the full
LR2PPO train step over a dp x tp mesh on the fake 8-device backend."""

import pytest


@pytest.mark.slow
def test_dryrun_multichip_8():
    import __graft_entry__ as g

    g.dryrun_multichip(8)


def test_dryrun_rejects_oversubscription():
    import __graft_entry__ as g

    with pytest.raises(AssertionError, match="need 16 devices"):
        g.dryrun_multichip(16)
