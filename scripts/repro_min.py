import time

import ray

t0 = time.perf_counter()
ray.init(address="local", num_cpus=4, include_dashboard=False)
print("init", round(time.perf_counter() - t0, 1), flush=True)
import ray.data as rd

t0 = time.perf_counter()
n = rd.range(100).count()
print("count", n, round(time.perf_counter() - t0, 1), flush=True)
ray.shutdown()
print("done", flush=True)
