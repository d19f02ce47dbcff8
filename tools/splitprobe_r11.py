"""Round-11 probe: per-query best-of-3 wall split into plan-construction
vs action time (guide §1) — construction covers Catalyst planning, lazy-
checkpoint physical planning and range-bound sampling jobs.

Usage: python tools/splitprobe_r11.py q_a q_b ..."""
import sys, time
sys.path.insert(0, "/root/repo")
from ubparquet_spark.session import get_session
spark = get_session("splitprobe")
import __spark_entry__ as m
qs = m.queries()
names = sys.argv[1:]
for name in names:
    fn = qs[name]
    try: fn(spark, "/root/testdata/sf0.001").collect()
    except Exception: pass
    best = None
    for _ in range(3):
        t0 = time.perf_counter()
        df = fn(spark, "/root/testdata/sf0.1")
        t1 = time.perf_counter()
        df.collect()
        t2 = time.perf_counter()
        if best is None or (t2-t0) < best[0]:
            best = (t2-t0, t1-t0, t2-t1)
    print(f"{name}: total={best[0]:.2f} construct={best[1]:.2f} action={best[2]:.2f}", flush=True)
