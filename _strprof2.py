import time, numpy as np
from apsim_tpu import AllPairsConfig, Engine
from apsim_tpu.bench.data import load_enron_tfidf
csr, ids = load_enron_tfidf()
n = csr.n_rows
eng = Engine(AllPairsConfig())
t_tot = []
t00 = time.time()
for s in range(0, n, 256):
    e = min(s + 256, n)
    batch = [(ids[i], csr.row(i)) for i in range(s, e)]
    t0 = time.perf_counter()
    out = eng.insert(batch, tau=0.8)
    t_tot.append(time.perf_counter() - t0)
tot = time.time() - t00
print(f"streamed {n} rows in {tot:.1f}s = {n/tot:.0f} vec/s  (median batch {np.median(t_tot)*1e3:.0f} ms)")
print(f"dim_cap={eng.dim_cap} row_cap={eng.row_cap} dormant={eng.stats['dormant_dims']}")
# emitted parity vs batch join
eng2 = Engine(AllPairsConfig()); eng2.build(csr, ids)
print("final all_pairs parity:", eng.all_pairs(0.8).pair_set() == eng2.all_pairs(0.8).pair_set())
