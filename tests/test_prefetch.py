import time

from embodied_object_detection_tpu.data.prefetch import prefetch_iterator


def test_order_preserved():
    got = list(prefetch_iterator(lambda i: i * 2, range(10), num_workers=3))
    assert got == [i * 2 for i in range(10)]


def test_zero_workers_synchronous():
    got = list(prefetch_iterator(lambda i: i, range(5), num_workers=0))
    assert got == list(range(5))


def test_overlap_actually_happens():
    def slow(i):
        time.sleep(0.05)
        return i
    t0 = time.perf_counter()
    out = list(prefetch_iterator(slow, range(8), num_workers=4, buffer=4))
    dt = time.perf_counter() - t0
    assert out == list(range(8))
    assert dt < 8 * 0.05 * 0.9       # faster than serial
