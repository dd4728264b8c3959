import sys, time
sys.argv = ["bench.py"]
import bench
t0 = time.perf_counter()
hier, ps = bench.get_mesh(5)
print(f"refs=5 built in {time.perf_counter()-t0:.0f}s", flush=True)
print(hier.describe(), flush=True)
print(f"P={ps.P} lat={ps.fine.lat_shape} sites={ps.fine.n_sites}", flush=True)
