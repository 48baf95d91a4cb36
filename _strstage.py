import time, numpy as np
from apsim_tpu import AllPairsConfig, Engine
from apsim_tpu.bench.data import load_enron_tfidf
import apsim_tpu.engine.engine as E

csr, ids = load_enron_tfidf()
n = csr.n_rows
eng = Engine(AllPairsConfig())

stages = {}
def wrap(name, fn):
    def inner(*a, **k):
        t0 = time.perf_counter()
        r = fn(*a, **k)
        stages.setdefault(name, []).append(time.perf_counter() - t0)
        return r
    return inner

eng._stream_archive_singletons = wrap("archive", eng._stream_archive_singletons)
eng._grow_for = wrap("grow", eng._grow_for)
eng._activate_dormant = wrap("activate", eng._activate_dormant)
import apsim_tpu.ops.score as S
orig_fused = S.insert_match_fused
S.insert_match_fused = wrap("fused_dispatch", orig_fused)
orig_emit = eng._emit_query_results
eng._emit_query_results = wrap("emit", orig_emit)
orig_consume = eng._consume_match
eng._consume_match = wrap("consume_fetch", orig_consume)

t_tot = []
for s in range(0, n, 256):
    e = min(s + 256, n)
    batch = [(ids[i], csr.row(i)) for i in range(s, e)]
    t0 = time.perf_counter()
    eng.insert(batch, tau=0.8)
    t_tot.append(time.perf_counter() - t0)
print(f"median batch {np.median(t_tot)*1e3:.0f} ms over {len(t_tot)}")
for k, v in sorted(stages.items()):
    print(f"  {k}: median {np.median(v)*1e3:.1f} ms  total {sum(v):.1f}s  x{len(v)}")
