import faulthandler, sys
faulthandler.enable()
import time, numpy as np
from apsim_tpu import AllPairsConfig, Engine
from apsim_tpu.bench.data import load_enron_tfidf
csr, ids = load_enron_tfidf()
eng = Engine(AllPairsConfig(pallas_int8=True))
eng.build(csr, ids)
print("built, starting all_pairs", flush=True)
r = eng.all_pairs(0.8)
print("pairs", r.n_pairs, flush=True)
