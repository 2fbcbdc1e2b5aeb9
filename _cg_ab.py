import json, time
import bench
t0=time.time()
build_s, feats = bench.bench_kernel_build()
print("build", round(time.time()-t0,1))
r1 = bench.bench_cg(feats)
r2 = bench.bench_cg(feats)
print(json.dumps({"cg_iters_per_s": [round(r1,2), round(r2,2)]}))
