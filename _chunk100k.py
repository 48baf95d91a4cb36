import time, numpy as np
from apsim_tpu import AllPairsConfig
from apsim_tpu.engine import ChunkedAllPairs
from apsim_tpu.bench.scale import synthetic_corpus
n = 100_000
t0=time.time(); csr = synthetic_corpus(n); print(f"gen {time.time()-t0:.1f}s", flush=True)
eng = ChunkedAllPairs(AllPairsConfig())
t0=time.time(); st = eng.build(csr); print("build", f"{time.time()-t0:.1f}s", {k: st[k] for k in ("n_chunks","chunk_cap","row_cap")}, "dormant:", eng.stats["dormant_dims"], flush=True)
t0=time.time(); res = eng.all_pairs(0.8); warm=time.time()-t0
t0=time.time(); res = eng.all_pairs(0.8); join=time.time()-t0
print(f"join warm {warm:.1f}s steady {join:.1f}s pairs={res.n_pairs} -> {n*(n-1)/2/join/1e9:.2f}B decided pairs/s", flush=True)
# streaming insert at scale
batch = [(f"s{i}", csr.row(i)) for i in range(256)]
eng.insert(batch, tau=0.99)  # warm insert path
t0=time.time(); eng.insert([(f"t{i}", csr.row(i+256)) for i in range(256)], tau=0.99); print(f"stream 256 rows: {time.time()-t0:.2f}s", flush=True)
