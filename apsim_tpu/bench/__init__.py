from .baseline import ReferenceBaseline, measure_baseline
from .data import load_enron_tfidf
