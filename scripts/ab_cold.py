"""A/B the bench cold phase: fanout concurrency conf on (8) vs off (1).

    python /tmp/ab_cold.py <on|off>

Runs ONE fresh session's 8-way concurrent cold pass over the headline
list (same code path as bench.py) and prints the wall seconds.
"""
import sys, time
import os as _os
sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

from concurrent.futures import ThreadPoolExecutor

from es_analytics_spark.functions.fanout import CONCURRENCY_CONF
from es_analytics_spark.queries import REGISTRY
from es_analytics_spark.session import get_spark
from bench import HEADLINE

mode = sys.argv[1]
sf_dir = "/root/testdata/sf0.1"
spark = get_spark("ab-cold")
names = [n for n in HEADLINE if n in REGISTRY]
REGISTRY[names[0]].fn(spark, sf_dir).count()

def run(name):
    t0 = time.perf_counter()
    REGISTRY[name].fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
    return time.perf_counter() - t0

serial = [n for n in names if REGISTRY[n].mutates_conf]
pooled = [n for n in names if n not in serial]
spark.conf.set(CONCURRENCY_CONF, "8" if mode == "on" else "1")
t0 = time.perf_counter()
with ThreadPoolExecutor(max_workers=8) as pool:
    list(pool.map(run, pooled))
spark.conf.set(CONCURRENCY_CONF, "1")
for n in serial:
    run(n)
print(f"cold({mode}) = {time.perf_counter() - t0:.2f}s")
