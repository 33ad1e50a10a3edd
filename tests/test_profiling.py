import time

from dlimgedit_tpu.utils.profiling import Profiler


def test_profiler_records():
    p = Profiler(enabled=True)
    with p.measure("op"):
        time.sleep(0.01)
    with p.measure("op"):
        time.sleep(0.01)
    s = p.stats()["op"]
    assert s.count == 2
    assert s.mean_ms >= 9.0
    assert "op" in p.report()


def test_profiler_disabled_is_free():
    p = Profiler(enabled=False)
    fn = p.wrap("x", lambda a: a + 1)
    assert fn(1) == 2
    assert p.stats() == {}


def test_environment_profiling_hook():
    from dlimgedit_tpu import Backend, Environment, Options

    env = Environment(Options(backend=Backend.cpu, allow_random_weights=True,
                              enable_profiling=True))
    fn = env.executable(("k", 1), lambda: (lambda v: v * 2))
    assert fn(21) == 42
    assert env.profiler.stats()["k/1"].count == 1
