"""Observability utilities (utils/profiling)."""

import time

from iadmm_tpu.utils.profiling import (StepTimer, compile_watchdog,
                                       start_compile_watchdog)


def test_compile_watchdog_fires_after_budget(capsys):
    cancel = start_compile_watchdog("probe", budget_s=0.05)
    time.sleep(0.3)
    cancel()
    out = capsys.readouterr().out
    assert "[compile-watchdog] probe" in out


def test_compile_watchdog_cancelled_is_silent(capsys):
    with compile_watchdog("quiet", budget_s=5.0):
        pass
    time.sleep(0.1)
    assert "[compile-watchdog]" not in capsys.readouterr().out


def test_step_timer_accumulates():
    t = StepTimer()
    with t.phase("a"):
        time.sleep(0.01)
    with t.phase("a"):
        time.sleep(0.01)
    s = t.summary()
    assert s["a"]["count"] == 2 and s["a"]["total"] > 0.0
