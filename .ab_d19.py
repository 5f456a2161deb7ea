import time
from onechronos_etl_takehome_spark.session import get_spark, pin_semantics
from onechronos_etl_takehome_spark.plans.catalog import QUERIES
spark = get_spark(); pin_semantics(spark)
sf = "/root/testdata/sf0.1"
for name in ["d19_entity_resolution"]:
    times = []
    for _ in range(5):
        t0 = time.perf_counter()
        n = QUERIES[name](spark, sf).count()
        times.append(time.perf_counter() - t0)
    print(f"{name}: rows={n} min={min(times):.2f} all={[round(t,2) for t in times]}", flush=True)
spark.stop()
