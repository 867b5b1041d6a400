"""Failure detection and profiling hooks.

The reference's failure handling is `pdb.set_trace()` on NaN loss
(ppo.py:576-578, ppo_trad.py:505-506) — useless unattended. Here a NaN
in a reported metric aborts cleanly with a NonFiniteLossError naming the
step and the last saved checkpoint, so an external supervisor can restart
from save-best. Tracing wraps `jax.profiler` (SURVEY §5: the reference
has no profiler at all)."""

from __future__ import annotations

import contextlib
import math
from typing import Optional


class NonFiniteLossError(RuntimeError):
    pass


def check_finite(value: float, step: int, what: str = "loss",
                 checkpoint_hint: Optional[str] = None) -> float:
    """Raise NonFiniteLossError if `value` is NaN/inf; returns it else."""
    if not math.isfinite(value):
        hint = (f"; restart from the save-best checkpoint at "
                f"{checkpoint_hint}" if checkpoint_hint else "")
        raise NonFiniteLossError(
            f"non-finite {what} ({value}) at step {step}{hint}")
    return value


@contextlib.contextmanager
def maybe_trace(profile_dir: Optional[str]):
    """jax.profiler trace context when profile_dir is set, no-op else.
    View with tensorboard or xprof on the written trace."""
    if not profile_dir:
        yield
        return
    import jax

    jax.profiler.start_trace(profile_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class TraceWindow:
    """Profile a window of steps: starts a jax.profiler trace at step
    `start` and stops it `steps` later. No-op when dir is None."""

    def __init__(self, profile_dir: Optional[str], start: int = 10,
                 steps: int = 10):
        self.dir = profile_dir
        self.start = start
        self.stop_at = start + steps
        self.active = False

    def tick(self, step: int) -> None:
        if not self.dir:
            return
        import jax

        if step == self.start and not self.active:
            jax.profiler.start_trace(self.dir)
            self.active = True
        elif step >= self.stop_at and self.active:
            jax.profiler.stop_trace()
            self.active = False

    def close(self) -> None:
        if self.active:
            import jax

            jax.profiler.stop_trace()
            self.active = False


class StepTimer:
    """Step-time / throughput counter (replaces the dead tokens/s counter
    in reference trainer.py:167-178; here it is live in every trainer)."""

    def __init__(self):
        import time

        self._time = time.perf_counter
        self.reset()

    def reset(self) -> None:
        self.t0 = self._time()
        self.units = 0

    def add(self, n: int) -> None:
        self.units += n

    def rate(self) -> float:
        dt = self._time() - self.t0
        return self.units / dt if dt > 0 else 0.0
